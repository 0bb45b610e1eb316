from clipx.ops.attention import multihead_attention  # noqa: F401
