from .group_norm import group_norm
from .stats import channel_stats, METRIC_FNS
