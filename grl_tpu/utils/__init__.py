from grl_tpu.utils.json_handler import read_json, write_json
from grl_tpu.utils.logging import get_logger
from grl_tpu.utils.metric_tracker import Dictlist, MetricTracker

__all__ = [
    "read_json",
    "write_json",
    "get_logger",
    "Dictlist",
    "MetricTracker",
]
