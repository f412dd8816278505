"""Chemistry-layer tests: I/O, perception, canonicalisation, sanitisation,
standardisation — exercised on the reference demo molecules."""

import numpy as np
import pytest

from ml_conformer_generator_tpu.chem import (
    Molecule, SanitizeError, canonical_ranks, canonicalise,
    determine_connectivity, find_rings, from_mol_block, implicit_hydrogens,
    kekulize, read_mol_file, read_sdf, redefine_bonds, sanitize,
    standardize_mol, to_mol_block, to_xyz_block, write_sdf)
from ml_conformer_generator_tpu.chem.io import from_xyz_block

CEYYAG = "/root/reference/assets/demo_files/ceyyag.mol"
PABA = "/root/reference/assets/demo_files/paba.mol"


def test_molblock_roundtrip():
    mol = read_mol_file(CEYYAG)
    assert mol.num_atoms == 29
    assert mol.num_bonds == 30
    block = to_mol_block(mol)
    mol2 = from_mol_block(block)
    assert mol2.num_atoms == mol.num_atoms
    assert mol2.num_bonds == mol.num_bonds
    np.testing.assert_allclose(mol2.coords, mol.coords, atol=1e-3)
    np.testing.assert_array_equal(mol2.atomic_nums, mol.atomic_nums)


def test_xyz_roundtrip():
    mol = read_mol_file(CEYYAG)
    xyz = to_xyz_block(mol)
    mol2 = from_xyz_block(xyz)
    assert mol2.num_atoms == mol.num_atoms
    np.testing.assert_allclose(mol2.coords, mol.coords, atol=1e-6)


def test_sdf_roundtrip():
    mol = read_mol_file(PABA)
    text = write_sdf([mol, mol], props=[{"score": 0.5}, {"score": 0.7}])
    back = read_sdf(text)
    assert len(back) == 2
    assert back[0].num_atoms == mol.num_atoms


def test_connectivity_perception_matches_file_bonds():
    """Distance-based perception should recover the file's bond skeleton."""
    mol = read_mol_file(CEYYAG)
    perceived = determine_connectivity(mol)
    file_pairs = {(min(i, j), max(i, j)) for i, j, _ in mol.bonds}
    got_pairs = {(min(i, j), max(i, j)) for i, j, _ in perceived.bonds}
    assert file_pairs == got_pairs


def test_find_rings_benzene():
    mol = read_mol_file(CEYYAG)  # two aromatic rings
    heavy = mol.remove_hs()
    rings = find_rings(heavy)
    sizes = sorted(len(r) for r in rings)
    assert 6 in sizes


def test_canonical_ranks_permutation_invariant():
    mol = read_mol_file(PABA).remove_hs()
    mol = determine_connectivity(mol)
    perm = np.random.default_rng(0).permutation(mol.num_atoms)
    mol_p = mol.renumber(perm.tolist())
    c1 = canonicalise(mol)
    c2 = canonicalise(mol_p)
    np.testing.assert_array_equal(c1.atomic_nums, c2.atomic_nums)
    # canonical order must map both to the same structure
    b1 = {(min(i, j), max(i, j), o) for i, j, o in c1.bonds}
    b2 = {(min(i, j), max(i, j), o) for i, j, o in c2.bonds}
    assert b1 == b2
    np.testing.assert_allclose(
        np.sort(np.linalg.norm(c1.coords - c1.coords.mean(0), axis=1)),
        np.sort(np.linalg.norm(c2.coords - c2.coords.mean(0), axis=1)),
        atol=1e-6)


def test_kekulize_benzene():
    # benzene ring as aromatic bonds
    coords = np.array([[np.cos(t), np.sin(t), 0.0]
                       for t in np.linspace(0, 2 * np.pi, 7)[:-1]]) * 1.39
    bonds = [(i, (i + 1) % 6, 4) for i in range(6)]
    mol = Molecule(np.full(6, 6), coords, bonds)
    kek = kekulize(mol)
    orders = sorted(o for _, _, o in kek.bonds)
    assert orders == [1, 1, 1, 2, 2, 2]
    h = implicit_hydrogens(kek)
    np.testing.assert_array_equal(h, np.ones(6))


def test_kekulize_pyrrole():
    # 5-ring with N: N contributes the lone pair, 2 double bonds among carbons
    bonds = [(i, (i + 1) % 5, 4) for i in range(5)]
    mol = Molecule(np.array([7, 6, 6, 6, 6]), np.zeros((5, 3)), bonds)
    kek = kekulize(mol)
    orders = sorted(o for _, _, o in kek.bonds)
    assert orders == [1, 1, 1, 2, 2]
    v = {i: 0 for i in range(5)}
    for i, j, o in kek.bonds:
        v[i] += o
        v[j] += o
    assert v[0] == 2  # N keeps two single bonds (pyrrole-type)


def test_kekulize_impossible_raises():
    # 5-ring of all-carbon aromatic bonds cannot kekulise (odd cycle, all must)
    bonds = [(i, (i + 1) % 5, 4) for i in range(5)]
    mol = Molecule(np.full(5, 6), np.zeros((5, 3)), bonds)
    with pytest.raises(SanitizeError):
        kekulize(mol)


def test_sanitize_valence_violation():
    # carbon with 5 single bonds -> invalid
    bonds = [(0, i, 1) for i in range(1, 6)]
    mol = Molecule(np.full(6, 6), np.random.default_rng(0).standard_normal(
        (6, 3)), bonds)
    with pytest.raises(SanitizeError):
        sanitize(mol)


def test_sanitize_nitro_normalisation():
    # R-N(=O)=O becomes R-N+(-O-)=O
    bonds = [(0, 1, 1), (1, 2, 2), (1, 3, 2)]
    mol = Molecule(np.array([6, 7, 8, 8]),
                   np.random.default_rng(1).standard_normal((4, 3)), bonds)
    out = sanitize(mol)
    assert out.charges[1] == 1
    assert sorted(out.charges.tolist()) == [-1, 0, 0, 1]
    orders = sorted(o for _, _, o in out.bonds)
    assert orders == [1, 1, 2]


def test_standardize_full_molecule():
    mol = read_mol_file(CEYYAG).remove_hs()
    mol = determine_connectivity(mol)
    # give it sensible orders: all single is valid for this skeleton? May not
    # be; instead run through sanitize with perceived single bonds.
    std = standardize_mol(mol, optimize_geometry_flag=False)
    assert std is not None
    assert std.num_atoms == mol.num_atoms


def test_redefine_bonds_from_logits():
    mol = read_mol_file(PABA).remove_hs()
    n = mol.num_atoms
    logits = np.zeros((42, 42, 5), dtype=np.float32)
    logits[..., 0] = 5.0
    for i, j, o in mol.bonds:
        logits[i, j, o] = 10.0
        logits[j, i, o] = 10.0
    out = redefine_bonds(mol, logits)
    got = {(min(i, j), max(i, j), o) for i, j, o in out.bonds}
    want = {(min(i, j), max(i, j), o) for i, j, o in mol.bonds}
    assert got == want
    # device-side decode path: an argmax-decoded int8 (D, D) bond-type
    # matrix must give identical bonds to the float32 logits
    types = np.argmax(logits, axis=-1).astype(np.int8)
    out2 = redefine_bonds(mol, types)
    got2 = {(min(i, j), max(i, j), o) for i, j, o in out2.bonds}
    assert got2 == want


def test_largest_fragment():
    # two disconnected pieces: 3 atoms vs 2 atoms
    bonds = [(0, 1, 1), (1, 2, 1), (3, 4, 1)]
    mol = Molecule(np.array([6, 6, 8, 6, 6]),
                   np.arange(15).reshape(5, 3).astype(float), bonds)
    frag = mol.largest_fragment()
    assert frag.num_atoms == 3
    assert frag.num_bonds == 2


def test_smiles_output_order_linear_chain():
    """Propanol-shaped chain: the writer order is terminal-to-terminal
    (RDKit canonical SMILES 'CCCO'), NOT a rank argsort that could start
    mid-chain (reference order semantics, mol_utils.py:110-126)."""
    from ml_conformer_generator_tpu.chem.canonical import smiles_output_order
    mol = Molecule(np.array([8, 6, 6, 6]), np.zeros((4, 3)),
                   [(0, 1, 1), (1, 2, 1), (2, 3, 1)])
    order = smiles_output_order(mol)
    # starts at the terminal carbon (lowest rank: deg-1, Z=6), walks the chain
    assert order == [3, 2, 1, 0]


def test_smiles_output_order_is_connected_dfs():
    """Every atom after the first of a fragment is bonded to an earlier one
    (the property a SMILES writer order always has)."""
    mol = determine_connectivity(read_mol_file(CEYYAG).remove_hs())
    from ml_conformer_generator_tpu.chem.canonical import smiles_output_order
    order = smiles_output_order(mol)
    pos = {a: k for k, a in enumerate(order)}
    adj = mol.neighbors()
    for k, a in enumerate(order[1:], start=1):
        assert any(pos[b] < k for b in adj[a])


def test_smiles_output_order_permutation_invariant():
    mol = determine_connectivity(read_mol_file(PABA).remove_hs())
    from ml_conformer_generator_tpu.chem.canonical import smiles_output_order
    perm = np.random.default_rng(1).permutation(mol.num_atoms)
    mol_p = mol.renumber(perm.tolist())
    c1 = mol.renumber(smiles_output_order(mol))
    c2 = mol_p.renumber(smiles_output_order(mol_p))
    np.testing.assert_array_equal(c1.atomic_nums, c2.atomic_nums)
    b1 = {(min(i, j), max(i, j), o) for i, j, o in c1.bonds}
    b2 = {(min(i, j), max(i, j), o) for i, j, o in c2.bonds}
    assert b1 == b2


def test_featurize_native_and_python_order_agree():
    """prepare_adj_mat_seer_input's native-ranked fast path must produce the
    same canonical order as the pure-Python canonicalise fallback."""
    from ml_conformer_generator_tpu.chem import native
    from ml_conformer_generator_tpu.chem.featurize import (
        prepare_adj_mat_seer_input)
    mols = [read_mol_file(CEYYAG).remove_hs(), read_mol_file(PABA).remove_hs()]
    _, _, _, canon = prepare_adj_mat_seer_input(mols)
    expected = [canonicalise(determine_connectivity(m)) for m in mols]
    for got, want in zip(canon, expected):
        if native.available():
            np.testing.assert_array_equal(got.atomic_nums, want.atomic_nums)
            np.testing.assert_allclose(got.coords, want.coords)


PDB_SAMPLE = """HEADER    TEST MOLECULE
ATOM      1  N   ALA A   1      11.104   6.134  -6.504  1.00  0.00           N
ATOM      2  CA  ALA A   1      11.639   6.071  -5.147  1.00  0.00           C
ATOM      3  C   ALA A   1      10.762   5.191  -4.269  1.00  0.00           C
HETATM    4 CL1  LIG A   2       9.000   5.000  -4.000  1.00  0.00          CL
HETATM    5  O1  LIG A   2       8.000   4.000  -3.000  1.00  0.00
CONECT    4    5
TER
END
"""


def test_pdb_block_parsing():
    """PDB input path (reference streamlit_app/app.py:100-115 accepts .pdb):
    ATOM/HETATM coords, element column with atom-name fallback, CONECT."""
    from ml_conformer_generator_tpu.chem import from_pdb_block
    m = from_pdb_block(PDB_SAMPLE)
    assert list(m.atomic_nums) == [7, 6, 6, 17, 8]
    np.testing.assert_allclose(m.coords[0], [11.104, 6.134, -6.504])
    assert m.bonds == [(3, 4, 1)]


def test_read_mol_file_pdb(tmp_path):
    p = tmp_path / "ref.pdb"
    p.write_text(PDB_SAMPLE)
    m = read_mol_file(str(p))
    assert m.num_atoms == 5


def test_pdb_first_model_only():
    from ml_conformer_generator_tpu.chem import from_pdb_block
    two_models = (
        "MODEL        1\n"
        "ATOM      1  C   MOL A   1       0.000   0.000   0.000  1.00  0.00           C\n"
        "ENDMDL\n"
        "MODEL        2\n"
        "ATOM      1  C   MOL A   1       9.000   9.000   9.000  1.00  0.00           C\n"
        "ENDMDL\n")
    m = from_pdb_block(two_models)
    assert m.num_atoms == 1
    np.testing.assert_allclose(m.coords[0], [0.0, 0.0, 0.0])


def test_canonical_ranks_golden_acetic_acid():
    """Hand-verified Schneider/Sayle/Landrum initial invariants (r4 VERDICT
    item 3): acetic acid CC(=O)O. Invariants (degree, valence, Z, charge,
    H count, ring): C_methyl (1,1,6,0,3,0) < O_hydroxyl (1,1,8,0,1,0)
    < O_carbonyl (1,2,8,0,0,0) < C_carboxyl (3,4,6,0,0,0) — all distinct
    before refinement, so the ranks are exactly the invariant sort. The
    attached-H invariant is what splits the two oxygens."""
    from ml_conformer_generator_tpu.chem.canonical import canonical_ranks

    mol = Molecule(np.array([6, 6, 8, 8]), np.zeros((4, 3)),
                   bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 1)])
    assert canonical_ranks(mol).tolist() == [0, 3, 2, 1]


def test_canonical_ranks_golden_toluene():
    """Toluene (aromatized): methyl (deg 1) ranks first; para < meta < ortho
    by refinement (ortho sees the rank-6 ipso); ipso (deg 3, valence 4)
    last. Ring membership and half-rounded aromatic valence per the
    published invariants."""
    from ml_conformer_generator_tpu.chem.canonical import canonical_ranks

    # atoms: 0 methyl, 1 ipso, 2/6 ortho, 3/5 meta, 4 para
    ring = [(1, 2, 4), (2, 3, 4), (3, 4, 4), (4, 5, 4), (5, 6, 4),
            (6, 1, 4)]
    mol = Molecule(np.full(7, 6), np.zeros((7, 3)),
                   bonds=[(0, 1, 1)] + ring)
    r = canonical_ranks(mol).tolist()
    assert r[0] == 0 and r[1] == 6
    assert r[4] == 1                      # para
    assert sorted([r[3], r[5]]) == [2, 3]  # meta pair (automorphic split)
    assert sorted([r[2], r[6]]) == [4, 5]  # ortho pair


def test_canonical_ranks_ring_membership_invariant():
    """Ring membership is exact (bridge finding), not bounded ring search:
    in a 12-membered ring with a pendant chain, ring atoms and chain atoms
    of equal degree/element are split by the ring invariant."""
    from ml_conformer_generator_tpu.chem.canonical import (
        _ring_membership_exact, canonical_ranks)

    n_ring = 12
    bonds = [(i, (i + 1) % n_ring, 1) for i in range(n_ring)]
    bonds += [(0, 12, 1), (12, 13, 1), (13, 14, 1)]   # 3-atom pendant chain
    mol = Molecule(np.full(15, 6), np.zeros((15, 3)), bonds=bonds)
    assert _ring_membership_exact(15, bonds) == [1] * 12 + [0] * 3
    r = canonical_ranks(mol)
    # degree-2 chain atoms (12, 13) rank below all degree-2 ring atoms
    chain_deg2 = {int(r[12]), int(r[13])}
    ring_deg2 = {int(r[i]) for i in range(1, 12)}
    assert max(chain_deg2) < min(ring_deg2)


def test_canonical_ranks_hcount_splits_charged_oxygens():
    """Acetate CC(=O)[O-]: the carbonyl O (neutral, 0 H) and the charged O
    (-1, 0 H by the charge-adjusted valence model) split on the charge
    invariant, not on H count."""
    from ml_conformer_generator_tpu.chem.canonical import (
        _attached_h_counts, _initial_invariants)

    mol = Molecule(np.array([6, 6, 8, 8]), np.zeros((4, 3)),
                   bonds=[(0, 1, 1), (1, 2, 2), (1, 3, 1)],
                   charges=np.array([0, 0, 0, -1]))
    assert _attached_h_counts(mol) == [3, 0, 0, 0]
    inv = _initial_invariants(mol)
    assert inv[2] != inv[3] and inv[2][3] == 0 and inv[3][3] == -1


def test_canonical_ranks_documented_imidazole_divergence():
    """Documented divergence #1 (canonical.py module doc): on heavy-atom
    graphs the two imidazole nitrogens carry equal initial invariants (the
    pyrrole/pyridine N-H distinction is not recoverable); ranking must
    still be deterministic and permutation-invariant."""
    from ml_conformer_generator_tpu.chem import from_smiles, to_smiles
    from ml_conformer_generator_tpu.chem.canonical import _initial_invariants
    from ml_conformer_generator_tpu.chem.sanitize import aromatize

    m = aromatize(from_smiles("c1c[nH]cn1").remove_hs())
    inv = _initial_invariants(m)
    n_inv = [inv[a] for a in range(5) if int(m.atomic_nums[a]) == 7]
    assert n_inv[0] == n_inv[1]
    ref = to_smiles(m)
    rng = np.random.default_rng(7)
    for _ in range(6):
        assert to_smiles(m.renumber(list(rng.permutation(5)))) == ref


def test_sdf_roundtrip_unnamed_molecules():
    """r4 regression: read_sdf must not eat the blank name/comment header
    lines of unnamed records (write_sdf output round-trips)."""
    from ml_conformer_generator_tpu.chem.io import read_sdf, write_sdf

    a = Molecule(np.array([6, 8]), np.array([[0.0, 0, 0], [1.4, 0, 0]]),
                 bonds=[(0, 1, 1)])          # no name
    b = Molecule(np.array([7, 6, 6]),
                 np.array([[0.0, 0, 0], [1.4, 0, 0], [2.1, 1.2, 0]]),
                 bonds=[(0, 1, 1), (1, 2, 2)], name="named")
    out = read_sdf(write_sdf([a, b, a]))
    assert [m.num_atoms for m in out] == [2, 3, 2]
    assert out[1].name == "named"
    assert [tuple(x) for x in out[2].bonds] == [(0, 1, 1)]


def test_canonical_ranks_forced_aromatic_nh():
    """Divergence-class-1 narrowing (r4 verdict item 6): where unique
    kekulizability FORCES aromatic N-H placement, the attached-H invariant
    recovers it from the heavy-atom graph — pyrrole-type N (forced lone-pair
    donor) counts one attached H and splits from pyridine-type N exactly as
    RDKit's per-atom H counts split them; kekulization-ambiguous systems
    (real tautomer pairs) stay unsplit."""
    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.chem.canonical import (_attached_h_counts,
                                                           canonical_ranks)

    def n_hcounts(smi):
        m = from_smiles(smi).remove_hs()
        h = _attached_h_counts(m)
        return m, [h[a] for a in range(m.num_atoms)
                   if int(m.atomic_nums[a]) == 7]

    # FORCED pyrrole-type: double-bonding the N leaves an odd number of
    # carbons needing a perfect matching
    _, h = n_hcounts("c1ccc2[nH]ccc2c1")            # indole
    assert h == [1]
    _, h = n_hcounts("c1ccc2c(c1)cc[nH]2")          # indole, other atom order
    assert h == [1]
    _, h = n_hcounts("c1ccc2c(c1)[nH]c1ccccc12")    # carbazole
    assert h == [1]
    _, h = n_hcounts("c1cc[nH]c1")                  # pyrrole
    assert h == [1]

    # FORCED pyridine-type / no H possible
    _, h = n_hcounts("c1ccncc1")                    # pyridine
    assert h == [0]
    _, h = n_hcounts("Cn1cccc1")                    # N-methylpyrrole
    assert h == [0]

    # AMBIGUOUS (real tautomer pairs — undecidable from the heavy-atom
    # graph; RDKit only distinguishes them because the input H counts say
    # so): both roles kekulise, no H is inferred
    _, h = n_hcounts("c1c[nH]cn1")                  # imidazole
    assert h == [0, 0]
    _, h = n_hcounts("c1ncc2[nH]cnc2n1")            # purine (7H/9H)
    assert h == [0, 0, 0, 0]
    _, h = n_hcounts("c1cc2cc[nH]c2nc1")            # 7-azaindole (1H/7H)
    assert h == [0, 0]

    # relative order matches RDKit's invariant direction: fewer attached H
    # ranks first (pyridine-type N before pyrrole-type N)
    m, h = n_hcounts("c1ccncc1-c1cc[nH]c1")         # 2-phenylpyridine-pyrrole
    assert sorted(h) == [0, 1]
    ranks = canonical_ranks(m)
    n_atoms = [a for a in range(m.num_atoms) if int(m.atomic_nums[a]) == 7]
    hc = _attached_h_counts(m)
    pyridine_n = next(a for a in n_atoms if hc[a] == 0)
    pyrrole_n = next(a for a in n_atoms if hc[a] == 1)
    assert int(ranks[pyridine_n]) < int(ranks[pyrrole_n])


def test_kekulize_never_doubles_valence_saturated_atoms():
    """r5 regression: atoms with no valence room for a double bond
    (N-methylpyrrole N, furan O) must never receive one — previously they
    were cleared from their OWN adjacency but stayed in their neighbours',
    so a must-match carbon could still pick them as partner."""
    from ml_conformer_generator_tpu.chem import from_smiles
    from ml_conformer_generator_tpu.chem.sanitize import kekulize

    for smi, z_no_double in [("Cn1cccc1", 7), ("c1ccoc1", 8),
                             ("c1ccsc1", 16), ("Cn1ccc2ccccc21", 7)]:
        m = from_smiles(smi).remove_hs()
        k = kekulize(m)
        for i, j, o in k.bonds:
            if o == 2:
                assert int(m.atomic_nums[i]) != z_no_double
                assert int(m.atomic_nums[j]) != z_no_double
