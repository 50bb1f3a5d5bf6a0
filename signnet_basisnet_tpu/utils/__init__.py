from .logging import RunLogger
from .profiling import Throughput, trace, timed
