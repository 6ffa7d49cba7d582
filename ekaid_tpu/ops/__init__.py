"""Pure-jnp / Pallas compute ops (no flax, no parameters)."""

from ekaid_tpu.ops.graph import (  # noqa: F401
    pairwise_iou,
    pairwise_center_distance,
    pairwise_angle,
    bbox_relation_types,
    reverse_relation_type,
    spatial_adjacency,
    broadcast_adjacency,
    position_matrix,
    position_embedding,
    semantic_adjacency,
)
