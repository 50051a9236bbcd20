from .channels import (
    code_capacity,
    doubled_channel,
    phenomenological,
    syndrome_of,
    uniform_prior_llr,
)
from .circuit import (
    Circuit,
    DepolarizingNoise,
    circuit_to_dem,
    memory_experiment,
    memory_experiment_dem,
)
from .dem import DEMData, priors_to_llrs
from .spacetime import (
    fold_data_correction,
    sample_space_time,
    space_time_matrix,
    space_time_prior_llr,
)

__all__ = [
    "code_capacity",
    "doubled_channel",
    "phenomenological",
    "syndrome_of",
    "uniform_prior_llr",
    "DEMData",
    "priors_to_llrs",
    "Circuit",
    "DepolarizingNoise",
    "circuit_to_dem",
    "memory_experiment",
    "memory_experiment_dem",
    "space_time_matrix",
    "sample_space_time",
    "fold_data_correction",
    "space_time_prior_llr",
]
