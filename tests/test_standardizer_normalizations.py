"""One unit test per normalisation-table row of the reference standardiser
(``/root/reference/src/mlconfgen/utils/standardizer.py:19-43``), exercised
through :func:`ml_conformer_generator_tpu.chem.sanitize.normalize_charges`
(the adjacency-form equivalent of RDKit's SMIRKS ``Normalizer``)."""

import numpy as np

from ml_conformer_generator_tpu.chem.mol import Molecule
from ml_conformer_generator_tpu.chem.sanitize import (implicit_hydrogens,
                                                      normalize_charges,
                                                      sanitize)


def _mol(zs, bonds, charges=None):
    n = len(zs)
    return Molecule(np.asarray(zs), np.zeros((n, 3)), list(bonds),
                    None if charges is None else np.asarray(charges))


def _order(mol, i, j):
    for a, b, o in mol.bonds:
        if {a, b} == {i, j}:
            return o
    return 0


def test_nitro():
    # C-N(=O)=O  ->  C-N+(-O-)=O      (standardizer.py:21)
    m = _mol([6, 7, 8, 8], [(0, 1, 1), (1, 2, 2), (1, 3, 2)])
    out = normalize_charges(m)
    assert out.charges[1] == 1
    assert sorted([out.charges[2], out.charges[3]]) == [-1, 0]
    orders = sorted([_order(out, 1, 2), _order(out, 1, 3)])
    assert orders == [1, 2]
    implicit_hydrogens(out)  # must now be valence-legal


def test_diazonium():
    # C-N#N  ->  C-[N+]#N             (standardizer.py:22)
    m = _mol([6, 7, 7], [(0, 1, 1), (1, 2, 3)])
    out = normalize_charges(m)
    assert out.charges[1] == 1 and out.charges[2] == 0
    implicit_hydrogens(out)


def test_quaternary_n():
    # N(C)(C)(C)C v4 X4  ->  N+       (standardizer.py:23)
    m = _mol([7, 6, 6, 6, 6],
             [(0, 1, 1), (0, 2, 1), (0, 3, 1), (0, 4, 1)])
    out = normalize_charges(m)
    assert out.charges[0] == 1
    implicit_hydrogens(out)


def test_quaternary_n_requires_four_neighbors():
    # An iminium-like N (v4 but X3) is NOT matched by [N;X4;v4;+0]; the
    # reference leaves it to fail sanitisation, and so do we.
    m = _mol([7, 6, 6], [(0, 1, 2), (0, 2, 1), (1, 2, 1)])
    out = normalize_charges(m)
    assert out.charges[0] == 0


def test_trivalent_o():
    # C=O-C (v3 X2 neutral O, single bond to carbon) -> O+  (standardizer.py:24)
    m = _mol([6, 8, 6], [(0, 1, 2), (1, 2, 1)])
    out = normalize_charges(m)
    assert out.charges[1] == 1
    implicit_hydrogens(out)


def test_sulfoxide():
    # C-S(=O)-C  ->  C-[S+](-[O-])-C  (standardizer.py:25)
    m = _mol([6, 16, 8, 6], [(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    out = normalize_charges(m)
    assert out.charges[1] == 1 and out.charges[2] == -1
    assert _order(out, 1, 2) == 1
    implicit_hydrogens(out)


def test_sulfoxide_charged_form():
    # [SH1+1;D3](=O) pathological form (standardizer.py:27): already-charged
    # sulfoxide S keeps its + charge and the =O becomes -O-.
    m = _mol([6, 16, 8, 6], [(0, 1, 1), (1, 2, 2), (1, 3, 1)],
             charges=[0, 1, 0, 0])
    out = normalize_charges(m)
    assert out.charges[1] == 1 and out.charges[2] == -1
    assert _order(out, 1, 2) == 1


def test_sulfoxide_not_matched_when_o_neighbor():
    # [!O:1]...[!O:4] guards: sulfones / sulfinates don't match.
    m = _mol([8, 16, 8, 6], [(0, 1, 2), (1, 2, 2), (1, 3, 1)])
    out = normalize_charges(m)
    assert out.charges[1] == 0


def test_trivalent_s():
    # O=S-C (v3 D2 neutral S)  ->  O=[S+]-C   (standardizer.py:28)
    m = _mol([8, 16, 6], [(0, 1, 2), (1, 2, 1)])
    out = normalize_charges(m)
    assert out.charges[1] == 1
    assert _order(out, 0, 1) == 2
    implicit_hydrogens(out)


def test_amide_tautomer_nh1():
    # C(-OH)=NH  ->  C(=O)-NH2        (standardizer.py:34)
    m = _mol([6, 8, 7, 6], [(0, 1, 1), (0, 2, 2), (0, 3, 1)])
    out = normalize_charges(m)
    assert _order(out, 0, 1) == 2
    assert _order(out, 0, 2) == 1
    h = implicit_hydrogens(out)
    assert h[2] == 2 and h[1] == 0


def test_amide_tautomer_nh0():
    # C(-OH)=N-C  ->  C(=O)-NH-C      (standardizer.py:35)
    m = _mol([6, 8, 7, 6, 6], [(0, 1, 1), (0, 2, 2), (0, 3, 1), (2, 4, 1)])
    out = normalize_charges(m)
    assert _order(out, 0, 1) == 2
    assert _order(out, 0, 2) == 1
    h = implicit_hydrogens(out)
    assert h[2] == 1


def test_amide_tautomer_skips_ring_bond():
    # =;!@ guard: the C=N bond inside a ring must not be rewritten.
    # 4-ring: C0=N1-C2-C3-C0, with an exocyclic OH on C0.
    m = _mol([6, 7, 6, 6, 8],
             [(0, 1, 2), (1, 2, 1), (2, 3, 1), (3, 0, 1), (0, 4, 1)])
    out = normalize_charges(m)
    assert _order(out, 0, 1) == 2
    assert _order(out, 0, 4) == 1


def test_isolated_halide():
    # [F,Cl,Br,I;X0;+0] -> X-         (standardizer.py:36)
    for z in (9, 17, 35, 53):
        m = _mol([z, 6], [])
        out = normalize_charges(m)
        assert out.charges[0] == -1


def test_pyridine_oxide_odd_structure():
    # [C-]-[N+2]-[O-]  ->  C=[N+]-[O-]  (standardizer.py:37)
    m = _mol([6, 7, 8, 6, 6],
             [(0, 1, 1), (1, 2, 1), (1, 3, 1), (0, 4, 1)],
             charges=[-1, 2, -1, 0, 0])
    out = normalize_charges(m)
    assert out.charges[0] == 0 and out.charges[1] == 1 and out.charges[2] == -1
    assert _order(out, 0, 1) == 2
    implicit_hydrogens(out)


def test_odd_azide():
    # C-[N-]-[N+]#N  ->  C-N=[N+]=[N-]  (standardizer.py:38)
    m = _mol([6, 7, 7, 7], [(0, 1, 1), (1, 2, 1), (2, 3, 3)],
             charges=[0, -1, 1, 0])
    out = normalize_charges(m)
    assert list(out.charges) == [0, 0, 1, -1]
    assert _order(out, 1, 2) == 2 and _order(out, 2, 3) == 2
    implicit_hydrogens(out)


def test_neutral_noop():
    # A plain neutral molecule passes through unchanged.
    m = _mol([6, 6, 8], [(0, 1, 1), (1, 2, 2)])
    out = normalize_charges(m)
    assert list(out.charges) == [0, 0, 0]
    assert out.bonds == m.bonds


def test_fixed_point_composition():
    # Several motifs in one molecule all normalise in one call:
    # nitrobenzene fragment + sulfoxide + free chloride.
    m = _mol([6, 7, 8, 8, 6, 16, 8, 6, 17],
             [(0, 1, 1), (1, 2, 2), (1, 3, 2), (0, 4, 1), (4, 5, 1),
              (5, 6, 2), (5, 7, 1)])
    out = sanitize(m.largest_fragment())
    assert out.charges[1] == 1                       # nitro N+
    assert -1 in (out.charges[2], out.charges[3])    # nitro O-
    assert out.charges[5] == 1 and out.charges[6] == -1  # sulfoxide
    free_cl = normalize_charges(_mol([17], []))
    assert free_cl.charges[0] == -1
