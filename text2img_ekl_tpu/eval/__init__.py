from .inception_score import (  # noqa: F401
    InceptionScorer, compute_inception_score,
    negative_log_posterior_probability)
from .fid import (  # noqa: F401
    calculate_frechet_distance, calculate_activation_statistics,
    FIDScorer)
