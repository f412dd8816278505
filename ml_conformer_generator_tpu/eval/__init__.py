from .fcd import chemnet_embeddings, fcd, init_chemnet_params
from .fingerprints import morgan_fingerprint, tanimoto
from .frechet import (ffd, fingerprint_matrix, frechet_distance, identity_key,
                      inchi_analog_key, uniqueness)
from .harness import EvaluationReport, format_report, run_evaluation
from .pipeline import evaluate_samples
from .shape import (ALPHA, AMPLITUDE, ATOM_RADIUS, find_cliques, get_alpha,
                    shape_quadrupole, tanimoto_batch, tanimoto_score)
