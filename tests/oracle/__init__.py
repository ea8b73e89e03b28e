"""Pure-numpy oracle implementations of the published algorithm semantics.

SURVEY.md §4: the reference has no test suite and its mount is empty, so these
oracles are the framework's ground truth — greedy NMS (Fast R-CNN semantics),
MGP box shifting, seq-NMS dynamic programming, and tubelet rescoring, written
as straightforward per-element numpy/python with no masking/padding tricks.
Every device kernel must match them exactly (keep-sets / DP paths) or within
float tolerance (scores/coordinates).
"""
