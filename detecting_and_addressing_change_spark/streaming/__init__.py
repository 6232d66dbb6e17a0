from . import schedule, replay, prequential  # noqa: F401

# ddm_stream imports pyspark.sql.streaming.state; import lazily where used
# so environments without streaming-state support can still use the batch
# operators.
