"""Host-side utilities (reference parity: vdetlib/utils/{common,log,visual}.py)."""
