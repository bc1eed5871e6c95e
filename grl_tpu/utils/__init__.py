from grl_tpu.utils.experiment import ExperimentRun, get_experiment_run
from grl_tpu.utils.json_handler import read_json, write_json
from grl_tpu.utils.logging import get_logger
from grl_tpu.utils.metric_tracker import Dictlist, MetricTracker

__all__ = [
    "ExperimentRun",
    "get_experiment_run",
    "read_json",
    "write_json",
    "get_logger",
    "Dictlist",
    "MetricTracker",
]
