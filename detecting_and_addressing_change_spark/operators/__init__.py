from . import (  # noqa: F401
    ddm,
    dedup,
    embedder,
    mapping,
    metrics,
    nb,
    procrustes,
    similarity,
    topk,
    windows,
)
