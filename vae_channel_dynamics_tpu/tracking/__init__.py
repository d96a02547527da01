from .monitor import ActivityMonitor
from .deadneuron import DeadNeuronTracker
