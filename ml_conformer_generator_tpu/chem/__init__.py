"""Host-side chemistry kernel: perception, sanitisation, standardisation, I/O.

A self-contained replacement for the RDKit-backed chemistry layer of the
reference (SURVEY.md §2.1 L3): no external cheminformatics dependency.
"""

from .bonds import bonds_from_adjacency_logits, redefine_bonds
from .canonical import canonical_ranks, canonicalise, smiles_output_order
from .featurize import (fragment_to_xh, prepare_adj_mat_seer_input,
                        samples_to_molecules)
from .io import (from_mol_block, from_pdb_block, from_xyz_block,
                 read_mol_file, read_sdf, read_smiles_file,
                 to_mol_block, to_xyz_block, write_sdf)
from .mol import Molecule
from .molgraph import MolGraph, vector_graph_sort
from .perception import determine_connectivity, find_rings
from .sanitize import (SanitizeError, aromatize, implicit_hydrogens,
                       kekulize, sanitize)
from .smiles import SmilesError, from_smiles, to_smiles
from .standardize import standardize_batch, standardize_mol

__all__ = [
    "Molecule", "SanitizeError", "bonds_from_adjacency_logits",
    "canonical_ranks", "canonicalise", "smiles_output_order",
    "determine_connectivity", "find_rings",
    "MolGraph", "vector_graph_sort",
    "fragment_to_xh", "from_mol_block", "from_pdb_block", "from_xyz_block",
    "implicit_hydrogens", "kekulize", "prepare_adj_mat_seer_input",
    "read_mol_file", "read_sdf", "read_smiles_file", "redefine_bonds",
    "samples_to_molecules", "sanitize", "aromatize", "standardize_batch",
    "standardize_mol", "to_mol_block", "to_xyz_block", "write_sdf",
    "SmilesError", "from_smiles", "to_smiles",
]
