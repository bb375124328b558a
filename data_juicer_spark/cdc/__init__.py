from data_juicer_spark.cdc.events import generate_events, EVENT_SCHEMA  # noqa: F401
from data_juicer_spark.cdc.replay import CdcReplayer  # noqa: F401
