from . import (  # noqa: F401
    asof,
    caption_pairing,
    chunker,
    components,
    dedup,
    embedder,
    multimodal,
    sectionizer,
    sessionize,
    similarity,
    skew,
)
