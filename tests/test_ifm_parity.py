"""Float64 parity of the IFM / fragment host math vs the torch reference
(``/root/reference/src/mlconfgen/utils/mol_utils.py``: ``prepare_masks``
:226-252, ``ifm_prepare_gen_fragment_context`` :373-457,
``ifm_prepare_fragments_for_merge`` :460-505, ``inverse_coord_transform``
:508-524, ``shift_moi_to_com_batch`` :527-550).

These functions are pure torch (RDKit is only touched by the Mol-conversion
wrappers, which stay untested here — the array-level logic is the parity
surface); the reference module loads with an import-time RDKit stub
(``torch_ref_loader._stub_rdkit``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ml_conformer_generator_tpu.ops.moi import (inverse_coord_transform,
                                                moment_of_inertia_tensor,
                                                shift_moi_to_com_batch)
from ml_conformer_generator_tpu.utils.fragments import (
    ifm_prepare_fragments_for_merge, ifm_prepare_gen_fragment_context,
    prepare_fragment)
from ml_conformer_generator_tpu.utils.masks import prepare_masks

from torch_ref_loader import load_mol_utils

# exactly float32-representable norms: keeps the f64 comparison exact even
# though our normalize_context materialises them as f32
NORMS = {"mean": (100.0, 200.0, 300.0), "mad": (50.0, 64.0, 80.0)}


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_prepare_masks_parity():
    mu = load_mol_utils()
    n_nodes = np.array([5, 9, 12])
    N = 16
    nm_j, em_j = prepare_masks(jnp.asarray(n_nodes), N)
    nm_t, em_t = mu.prepare_masks(torch.tensor(n_nodes), N,
                                  torch.device("cpu"))
    np.testing.assert_array_equal(np.asarray(nm_j), nm_t.numpy())
    np.testing.assert_array_equal(
        np.asarray(em_j).reshape(-1, 1), em_t.numpy())


def test_moi_and_parallel_axis_parity(x64):
    mu = load_mol_utils()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 3))
    w = np.abs(rng.standard_normal(7)) + 0.5
    ours = np.asarray(moment_of_inertia_tensor(jnp.asarray(x), jnp.asarray(w)))
    theirs = mu.get_moment_of_inertia_tensor(
        torch.tensor(x), torch.tensor(w)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)

    B = 4
    moi = rng.standard_normal((B, 3, 3))
    moi = moi + np.swapaxes(moi, 1, 2)
    r = rng.standard_normal((B, 3))
    m = np.abs(rng.standard_normal(B)) + 1
    got = np.asarray(shift_moi_to_com_batch(
        jnp.asarray(moi), jnp.asarray(r), jnp.asarray(m)))
    # reference broadcasts one shared (3,3) over B, but also accepts (B,3,3)
    want = mu.shift_moi_to_com_batch(
        torch.tensor(moi), torch.tensor(r), torch.tensor(m)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_inverse_coord_transform_parity(x64):
    mu = load_mol_utils()
    rng = np.random.default_rng(1)
    B, N = 3, 8
    coord = rng.standard_normal((B, N, 3))
    shift = rng.standard_normal((B, 3))
    q, _ = np.linalg.qr(rng.standard_normal((B, 3, 3)))
    ours = np.asarray(inverse_coord_transform(
        jnp.asarray(coord), jnp.asarray(shift), jnp.asarray(q)))
    theirs = mu.inverse_coord_transform(
        torch.tensor(coord), torch.tensor(shift), torch.tensor(q)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


def test_ifm_gen_fragment_context_parity(x64):
    mu = load_mol_utils()
    rng = np.random.default_rng(2)
    ff_n, B, max_n, min_n = 6, 5, 32, 15
    frag_x = rng.standard_normal((ff_n, 3)) * 2.0
    ref_ctx = np.sort(np.abs(rng.standard_normal(3))) * 300 + 50
    n_nodes = rng.integers(min_n, 30, size=B)

    nm_j, em_j, ctx_j, shift_j, rot_j = ifm_prepare_gen_fragment_context(
        jnp.asarray(frag_x), jnp.asarray(ref_ctx),
        {k: jnp.asarray(v, jnp.float64) for k, v in NORMS.items()},
        np.asarray(n_nodes), max_n, min_n)

    norms_t = {k: torch.tensor(v, dtype=torch.float64)
               for k, v in NORMS.items()}
    nm_t, em_t, ctx_t, shift_t, rot_t = mu.ifm_prepare_gen_fragment_context(
        torch.tensor(frag_x), torch.tensor(ref_ctx), norms_t,
        torch.tensor(n_nodes).view(B, 1), max_n, min_n, torch.device("cpu"))

    np.testing.assert_array_equal(np.asarray(nm_j), nm_t.numpy())
    np.testing.assert_array_equal(np.asarray(em_j).reshape(-1, 1),
                                  em_t.numpy())
    # eigenvalues (and hence the normalised context) are well-ordered in both
    np.testing.assert_allclose(np.asarray(ctx_j), ctx_t.numpy(),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(shift_j), shift_t.numpy(),
                               rtol=1e-12, atol=1e-12)
    # eigenvector columns agree up to sign; both must reconstruct the same MOI
    np.testing.assert_allclose(np.abs(np.asarray(rot_j)),
                               np.abs(rot_t.numpy()), rtol=1e-7, atol=1e-8)
    # ctx outputs are broadcast over the padded node axis; row 0 is always
    # a real node, so recover the per-sample eigenvalues from it
    evals_t = np.sort(ctx_t.numpy()[:, 0, :] * np.asarray(NORMS["mad"])
                      + np.asarray(NORMS["mean"]), axis=-1)
    rot = np.asarray(rot_j)
    recon = rot @ (evals_t[..., None] * np.swapaxes(rot, 1, 2))
    recon_t = rot_t.numpy() @ (evals_t[..., None]
                               * np.swapaxes(rot_t.numpy(), 1, 2))
    np.testing.assert_allclose(recon, recon_t, rtol=1e-7, atol=1e-7)


def test_ifm_fragments_for_merge_parity(x64):
    mu = load_mol_utils()
    rng = np.random.default_rng(3)
    ff_n, B, max_n = 6, 4, 24
    gen_n = max_n - ff_n
    frag_x = rng.standard_normal((ff_n, 3))
    frag_h = np.eye(8)[rng.integers(0, 8, ff_n)].astype(np.float64)
    gen_x = rng.standard_normal((B, gen_n, 3))
    gen_h = np.eye(8)[rng.integers(0, 8, (B, gen_n))].astype(np.float64)

    z_j, fm_j = ifm_prepare_fragments_for_merge(
        jnp.asarray(frag_x), jnp.asarray(frag_h), jnp.asarray(gen_x),
        jnp.asarray(gen_h), max_n)
    z_t, fm_t = mu.ifm_prepare_fragments_for_merge(
        torch.tensor(frag_x), torch.tensor(frag_h), torch.tensor(gen_x),
        torch.tensor(gen_h), torch.device("cpu"), max_n)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(), rtol=1e-12,
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(fm_j), fm_t.numpy())


def test_prepare_fragment_semantics():
    """Array-level contract of the reference's prepare_fragment (:298-342):
    zero-pad to max_n_nodes, batch, fixed_mask on the first n atoms."""
    rng = np.random.default_rng(4)
    n, B, max_n = 5, 3, 20
    fx = rng.standard_normal((n, 3)).astype(np.float32)
    fh = np.eye(8)[rng.integers(0, 8, n)].astype(np.float32)
    z, fm = prepare_fragment(B, jnp.asarray(fx), jnp.asarray(fh), max_n, 15)
    assert z.shape == (B, max_n, 11)
    np.testing.assert_allclose(np.asarray(z)[:, :n, :3],
                               np.broadcast_to(fx, (B, n, 3)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(z)[:, n:], 0.0)
    np.testing.assert_array_equal(
        np.asarray(fm)[..., 0],
        np.broadcast_to(np.arange(max_n)[None, :] < n, (B, max_n)))
    with pytest.raises(ValueError):
        prepare_fragment(B, jnp.asarray(rng.standard_normal((16, 3))),
                         jnp.asarray(np.eye(8)[np.zeros(16, int)]), max_n, 15)
