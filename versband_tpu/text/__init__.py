from versband_tpu.text.embedders import (
    FlanT5Embedder,
    TextVocalEmbedder,
    TextVocalMusicalEmbedder,
    ClapTextEmbedder,
    ClapFlanEmbedder,
    ClassEmbedder,
    SpatialRescaler,
    HashTokenizer,
)
