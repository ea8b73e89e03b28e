"""JSON protocol layer — the wire contract shared with the reference.

Reference parity target: ``vdetlib/utils/protocol.py`` (proto_load/proto_dump
and the accessor/constructor family). All protos are plain-dict JSON documents;
this module keeps them bit-compatible while adding typed validation and
array-oriented views used by the device programs.
"""

from vdetlib_tpu.protos.codec import (  # noqa: F401
    proto_load,
    proto_dump,
    proto_exists,
)
from vdetlib_tpu.protos.accessors import (  # noqa: F401
    frame_path_at,
    frame_path_before,
    frame_path_after,
    frame_ids,
    boxes_at_frame,
    dets_at_frame,
    det_boxes_at_frame,
    det_scores_at_frame,
    tracks_at_frame,
    track_box_at_frame,
    top_detections,
    empty_det_from_box,
    tracks_proto_from_boxes,
    score_proto_from_track_proto,
)
from vdetlib_tpu.protos.arrays import (  # noqa: F401
    det_proto_to_arrays,
    arrays_to_det_proto,
    box_proto_to_arrays,
    track_proto_to_arrays,
    arrays_to_track_proto,
)
