"""Video-level algorithms — scanned/vmapped device programs over the frame axis.

Reference parity: ``vdetlib/vid/{detect,proposal,track}.py`` plus the MGP /
rescoring / seq-NMS pipeline stages (SURVEY.md §2.2, §3). The reference's
per-frame Python loops become static-shape batched programs here; protos stay
the wire format at stage boundaries.
"""
