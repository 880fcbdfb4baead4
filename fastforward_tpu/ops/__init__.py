"""Device ops: jitted/Pallas scoring programs for the index hot path."""

from fastforward_tpu.ops.scoring import (
    bucket,
    interpolate_scores,
    pad_i32,
    STREAM_CAP,
    STREAM_TILE_ROWS,
    build_streamed_layout,
    score_pairs_bounded,
    score_pairs_dense,
    score_pairs_grouped,
    score_pairs_grouped_pq,
    score_pairs_pq,
    score_pairs_streamed,
    pallas_stream_enabled,
    set_pallas_stream,
    streamed_scores,
)

__all__ = [
    "bucket",
    "pad_i32",
    "score_pairs_bounded",
    "score_pairs_streamed",
    "build_streamed_layout",
    "STREAM_TILE_ROWS",
    "STREAM_CAP",
    "score_pairs_dense",
    "score_pairs_pq",
    "score_pairs_grouped",
    "score_pairs_grouped_pq",
    "interpolate_scores",
    "streamed_scores",
    "pallas_stream_enabled",
    "set_pallas_stream",
]
