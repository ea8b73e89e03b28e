"""``python -m vdetlib_tpu <tool> [args...]`` — stage tool dispatcher."""

import sys

from vdetlib_tpu.cli import TOOLS, dispatch


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m vdetlib_tpu <tool> [args...]")
        print("tools:", ", ".join(sorted(TOOLS)))
        return 0
    return dispatch(sys.argv[1], sys.argv[2:]) or 0


if __name__ == "__main__":
    raise SystemExit(main())
