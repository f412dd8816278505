"""First-party SMILES writer/parser tests (chem/smiles.py).

The reference uses RDKit canonical SMILES as the uniqueness key of its
evaluation protocol (``research_scripts/evaluation.py:12-42``) and SMILES
corpora as FFD/FCD comparison sets (``research_scripts/ffd_fcd/*``); parity
here is at the identity level (permutation-invariant canonical strings,
lossless graph round trips), not RDKit's exact character sequences.
"""

import glob

import numpy as np
import pytest

from ml_conformer_generator_tpu.chem import (SmilesError, determine_connectivity,
                                             from_smiles, kekulize,
                                             read_mol_file, to_smiles)
from ml_conformer_generator_tpu.chem.io import read_smiles_file
from ml_conformer_generator_tpu.eval.frechet import identity_key

CASES = [
    "CCO", "CC(C)C", "C1CCCCC1", "c1ccccc1", "c1ccncc1", "c1cc[nH]c1",
    "C[N+](C)(C)C", "CC(=O)[O-]", "N#Cc1ccccc1", "C1=CC2=CC=CC2=C1",
    "c1ccc(-c2ccccc2)cc1", "c1ccc(c2ccccc2)cc1", "CC(=O)Nc1ccc(O)cc1",
    "O=C(O)c1ccccc1OC(C)=O", "C1CC2CCC1CC2", "[O-]S(=O)(=O)[O-]",
    "CCOC(=O)C", "FC(F)(F)c1ccccc1", "Clc1ccccc1Br", "CN1CCC[C@H]1c1cccnc1",
]


def _key(mol):
    return identity_key(kekulize(mol))


@pytest.mark.parametrize("smi", CASES)
def test_roundtrip_preserves_identity(smi):
    m = from_smiles(smi).remove_hs()
    m2 = from_smiles(to_smiles(m)).remove_hs()
    assert _key(m) == _key(m2)


@pytest.mark.parametrize("smi", CASES)
def test_canonical_is_permutation_invariant(smi):
    m = from_smiles(smi).remove_hs()
    ref = to_smiles(m)
    rng = np.random.default_rng(hash(smi) % 2**32)
    for _ in range(8):
        perm = list(rng.permutation(m.num_atoms))
        assert to_smiles(m.renumber(perm)) == ref


def test_parser_details():
    # charges, brackets, explicit hydrogens
    m = from_smiles("C[N+](C)(C)C")
    assert int(m.charges.sum()) == 1
    assert sorted(m.atomic_nums.tolist()) == [6, 6, 6, 6, 7]
    # [nH] materialises the hydrogen
    m = from_smiles("c1cc[nH]c1")
    assert (m.atomic_nums == 1).sum() == 1
    assert m.remove_hs().num_atoms == 5
    # %nn ring closure
    a = from_smiles("C%12CCCCC%12")
    b = from_smiles("C1CCCCC1")
    assert _key(a) == _key(b)
    # dot-separated fragments
    m = from_smiles("[O-]C(=O)C.[O-]C(=O)C")
    assert len(m.connected_components()) == 2
    # aromatic bond outside a ring demotes to single (biphenyl, no dash)
    m = from_smiles("c1ccc(c2ccccc2)cc1")
    orders = sorted(o for _, _, o in m.bonds)
    assert orders.count(4) == 12 and orders.count(1) == 1


def test_parser_rejects_malformed():
    for bad in ["C(", "C)", "C1CC", "[Xx]", "C[", "C%1C", "C=1CC#1"]:
        with pytest.raises(SmilesError):
            from_smiles(bad)


def test_aromatic_kekulized_forms_share_identity():
    assert _key(from_smiles("c1ccccc1")) == _key(from_smiles("C1=CC=CC=C1"))
    assert _key(from_smiles("c1ccncc1")) == _key(from_smiles("C1=CC=NC=C1"))


def test_demo_molecules_roundtrip():
    """Real 3D reference conformers: perceive bonds, write, parse, compare."""
    for path in sorted(glob.glob("/root/reference/assets/demo_files/*.mol")):
        m = read_mol_file(path).remove_hs()
        if m.num_bonds == 0:
            m = determine_connectivity(m)
        smi = to_smiles(m)
        m2 = from_smiles(smi).remove_hs()
        assert _key(m) == _key(m2), path
        assert m2.num_atoms == m.num_atoms


def test_read_smiles_file(tmp_path):
    p = tmp_path / "corpus.smi"
    p.write_text("# comment line\n"
                 "CCO ethanol\n"
                 "c1ccccc1\tbenzene\n"
                 "not_a_smiles!!\n"
                 "CC(=O)O acetic acid\n")
    mols = read_smiles_file(str(p))
    assert [m.name for m in mols] == ["ethanol", "benzene", "acetic acid"]
    assert mols[1].num_atoms == 6
    with pytest.raises(SmilesError):
        read_smiles_file(str(p), skip_bad=False)
    assert len(read_smiles_file(str(p), limit=2)) == 2


def test_molecule_method():
    m = from_smiles("CCO")
    assert m.to_smiles() == "CCO"


def test_identity_key_is_representation_invariant():
    """Review regression: aromatic and every Kekulé assignment of the same
    molecule must share one uniqueness key (to_smiles aromatizes before
    canonical ranking — chem/sanitize.py::aromatize)."""
    same = [
        ("c1ccccc1", "C1=CC=CC=C1"),
        ("Cc1cccnc1", "CC1=CC=CN=C1"),
        ("Cc1cccnc1", "CC=1C=CC=NC1"),       # the other Kekulé assignment
        ("c1ccc2ccccc2c1", "C1=CC=C2C=CC=CC2=C1"),
        ("c1cc[nH]c1", "C1=CC=CN1"),
    ]
    for a, b in same:
        ka = identity_key(from_smiles(a).remove_hs())
        kb = identity_key(from_smiles(b).remove_hs())
        assert ka == kb, (a, b, ka, kb)
    # round trips are fixed points
    for smi in ["c1ccc2ccccc2c1", "O=C1C=CC(=O)C=C1", "C=Cc1ccccc1"]:
        m = from_smiles(smi).remove_hs()
        assert identity_key(from_smiles(to_smiles(m)).remove_hs()) \
            == identity_key(m)


def test_aromatize():
    from ml_conformer_generator_tpu.chem import aromatize

    def n_aromatic(m):
        return sum(1 for _, _, o in m.bonds if o == 4)

    assert n_aromatic(aromatize(from_smiles("C1=CC=CC=C1"))) == 6
    assert n_aromatic(aromatize(from_smiles("C1=CC=C2C=CC=CC2=C1"))) == 11
    assert n_aromatic(aromatize(from_smiles("C1=CC=CN1").remove_hs())) == 5
    # NOT aromatic: quinone (exocyclic C=O, 4 pi), cyclohexane (sp3),
    # cyclobutadiene (4n)
    for smi in ["O=C1C=CC(=O)C=C1", "C1CCCCC1", "C1=CC=C1"]:
        assert n_aromatic(aromatize(from_smiles(smi))) == 0
    # idempotent on aromatic input
    m = from_smiles("c1ccccc1")
    assert n_aromatic(aromatize(m)) == 6


def test_metal_counterions_and_salts():
    """Review regression: salt forms in corpora must parse, not drop."""
    for smi in ["[Na+]", "[K+]", "[Ca+2]", "[Fe]", "[Zn+2]", "[NH4+]"]:
        m = from_smiles(smi)
        assert to_smiles(m.remove_hs()).startswith("[")
    salt = from_smiles("CC(=O)[O-].[Na+]")
    assert len(salt.connected_components()) == 2
    assert int(salt.charges.sum()) == 0


def test_read_smiles_file_csv(tmp_path):
    """Review regression: comma-separated smiles,name exports must load."""
    p = tmp_path / "corpus.csv"
    p.write_text("smiles,name\nCCO,ethanol\nc1ccccc1,benzene\n"
                 "CC(=O)[O-].[Na+],sodium acetate\n")
    mols = read_smiles_file(str(p))
    assert [m.name for m in mols] == ["ethanol", "benzene", "sodium acetate"]
    # corpus molecules come back kekulised (pipeline bond-order convention)
    assert all(o != 4 for m in mols for _, _, o in m.bonds)


def test_long_chain_no_recursion_limit():
    """Review regression: emission is iterative — a 1500-atom chain must
    not hit Python's recursion limit."""
    n = 1500
    smi = "C" * n
    m = from_smiles(smi)
    out = to_smiles(m)
    assert out == "C" * n


def test_p_se_heterocycle_identity_invariant():
    """Advisor r3 regression: aromatize's lone-pair scope must match the
    parser's aromatic-element set (smiles._AROMATIC_OK), so aromatic and
    Kekulé forms of phosphole/selenophene share one identity key
    (periodic.PI_ELECTRONS_LONE_PAIR includes P and Se)."""
    pairs = [
        ("c1cc[se]c1", "C1=CC=C[Se]1"),    # selenophene
        ("c1cc[pH]c1", "C1=CC=C[PH]1"),    # phosphole
        ("c1ccc2[se]ccc2c1", "C1=CC=C2[Se]C=CC2=C1"),  # fused Se bicycle
    ]
    for a, b in pairs:
        ka = identity_key(from_smiles(a).remove_hs())
        kb = identity_key(from_smiles(b).remove_hs())
        assert ka == kb, (a, b, ka, kb)


def test_fused_kekule_assignment_invariance():
    """Advisor r3: the endo-pi test in aromatize is deliberately against
    atoms of ANY ring — both Kekulé assignments of naphthalene (one puts the
    8a=1 double bond "in the other ring") must aromatize identically."""
    from ml_conformer_generator_tpu.chem import aromatize

    forms = ["C1=CC=C2C=CC=CC2=C1",        # doubles on the fusion bond side
             "C=1C=CC=2C=CC=CC2C1",        # shifted assignment
             "c1ccc2ccccc2c1"]
    keys = {identity_key(from_smiles(s).remove_hs()) for s in forms}
    assert len(keys) == 1, keys
    n_arom = {sum(1 for _, _, o in aromatize(from_smiles(s).remove_hs()).bonds
                  if o == 4) for s in forms}
    assert n_arom == {11}
    # fulvalene (two unfused cross-conjugated rings) stays non-aromatic
    fulvalene = from_smiles("C1=CC(=C2C=CC=C2)C=C1")
    assert all(o != 4 for _, _, o in aromatize(fulvalene).bonds)


def test_read_smiles_file_order_invariant_fingerprints(tmp_path):
    """Advisor r3 regression: corpus molecules must carry an
    input-order-independent Kekulé assignment, else Morgan fingerprints (and
    hence FFD/FCD) depend on how each corpus wrote its SMILES."""
    from ml_conformer_generator_tpu.eval.fingerprints import morgan_fingerprint

    p = tmp_path / "corpus.smi"
    # the same o-disubstituted benzene written from different start atoms /
    # directions, plus an asymmetric aromatic with a hetero ring
    p.write_text("Clc1ccccc1Br a\n"
                 "Brc1ccccc1Cl b\n"
                 "c1cc(Br)c(Cl)cc1 c\n"
                 "Cc1cccnc1 d\n"
                 "c1ncc(C)cc1 e\n")
    mols = read_smiles_file(str(p))
    fps = [tuple(morgan_fingerprint(m)) for m in mols]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] == fps[4]
