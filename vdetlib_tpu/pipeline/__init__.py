"""Pipeline orchestration — stage configs, checkpoints, the full T-CNN flow."""
