from .fingerprints import morgan_fingerprint, tanimoto
from .pipeline import evaluate_samples
from .shape import (ALPHA, AMPLITUDE, ATOM_RADIUS, find_cliques, get_alpha,
                    shape_quadrupole, tanimoto_batch, tanimoto_score)
