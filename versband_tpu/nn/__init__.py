from versband_tpu.nn.core import (
    RMSNorm,
    modulate,
    TimestepEmbedder,
    ConditionEmbedder,
    FeedForward,
    swiglu_hidden_dim,
    precompute_rope,
    apply_rope,
    JointAttention,
    sdpa,
)
