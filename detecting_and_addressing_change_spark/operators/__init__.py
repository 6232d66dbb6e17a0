from . import topk, windows, ddm, metrics, nb, procrustes, dedup, similarity  # noqa: F401
