import numpy as np
import jax
import jax.numpy as jnp

from shgvqa_tpu.models.capsules import (
    CapsuleVisualTokenizer,
    EMRouting,
    LanguageCapsuleMask,
    PrimaryCaps,
)


def test_primary_caps_shapes():
    m = PrimaryCaps(num_caps=6, pose_dim=3)
    x = jnp.zeros((2, 4, 8))
    p = m.init(jax.random.PRNGKey(0), x)
    poses, acts = m.apply(p, x)
    assert poses.shape == (2, 4, 6, 9)
    assert acts.shape == (2, 4, 6)
    a = np.asarray(acts)
    assert (a >= 0).all() and (a <= 1).all()


def test_em_routing_shapes_and_activations():
    rng = np.random.RandomState(0)
    m = EMRouting(c_out=5, pose_dim=3)
    poses = jnp.asarray(rng.randn(7, 4, 9), jnp.float32)
    acts = jnp.asarray(rng.rand(7, 4), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), poses, acts)
    mu, a = m.apply(p, poses, acts)
    assert mu.shape == (7, 5, 9)
    assert a.shape == (7, 5)
    a_np = np.asarray(a)
    assert np.isfinite(np.asarray(mu)).all()
    assert (a_np > 0).all() and (a_np < 1).all()


def test_em_routing_zero_input_acts():
    """All-zero input activations must not NaN (eps guards)."""
    m = EMRouting(c_out=3, pose_dim=2)
    poses = jnp.ones((2, 4, 4))
    acts = jnp.zeros((2, 4))
    p = m.init(jax.random.PRNGKey(0), poses, acts)
    mu, a = m.apply(p, poses, acts)
    assert np.isfinite(np.asarray(mu)).all()
    assert np.isfinite(np.asarray(a)).all()


def test_capsule_tokenizer_geometry():
    m = CapsuleVisualTokenizer(hidden_size=16, num_prim_caps=4,
                               num_vis_caps=3, pose_dim=2)
    feats = jnp.zeros((2, 2, 3, 3, 8))
    p = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(p, feats)
    # caps_dim = 3*(4+1) = 15; tokens = 1 + 2*3*3 = 19
    assert out.shape == (2, 19, 15)


def test_language_capsule_mask():
    rng = np.random.RandomState(0)
    m = LanguageCapsuleMask(num_vis_caps=3, pose_dim=2, skip_connection=False)
    caps = jnp.asarray(rng.randn(2, 5, 15), jnp.float32)
    lang = jnp.asarray(rng.randn(2, 8), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), caps, lang)
    out = m.apply(p, caps, lang)
    assert out.shape == caps.shape
    # CLS row unchanged
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(caps[:, 0]))
    # with skip connection output differs from plain mask
    m2 = LanguageCapsuleMask(num_vis_caps=3, pose_dim=2, skip_connection=True)
    p2 = m2.init(jax.random.PRNGKey(0), caps, lang)
    out2 = m2.apply(p2, caps, lang)
    assert np.abs(np.asarray(out2[:, 1:]) - np.asarray(out[:, 1:])).max() > 0


def test_em_routing_grad_finite():
    m = EMRouting(c_out=3, pose_dim=2)
    rng = np.random.RandomState(1)
    poses = jnp.asarray(rng.randn(4, 5, 4), jnp.float32)
    acts = jnp.asarray(rng.rand(4, 5), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), poses, acts)

    def loss(p):
        mu, a = m.apply(p, poses, acts)
        return jnp.sum(mu ** 2) + jnp.sum(a)

    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


import os
import pytest

REF = "/root/reference/AGQA"


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference tree not mounted")
def test_em_routing_reference_variant_parity():
    """variant='reference' EM routing is bit-faithful to the actual
    ConvCaps.caps_em_routing (capsules_new_3d.py:189-295), transplanted
    beta_u/beta_a, identical votes/activations, all 3 iterations."""
    import sys

    import jax.numpy as jnp
    import numpy as np

    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.lxrt.capsules_new_3d import ConvCaps

    B_in, C_out, P = 5, 4, 4
    n = 6
    ref = ConvCaps(B=B_in, C=C_out, K=(1, 1), P=P, stride=1, iters=3)
    ref.eval()

    rng = np.random.RandomState(0)
    votes = rng.randn(n, B_in, C_out, P * P).astype(np.float32)
    a_in = rng.rand(n, B_in).astype(np.float32)

    # the reference's a_out divides by a stdv that collapses to sqrt(eps)
    # = 1e-4 (sum-before-square bug), a 1e4 amplifier of f32 reduction-order
    # noise -- so algorithm identity is proven in float64, where both sides
    # agree to 1e-9
    ref.double()
    with torch.no_grad():
        mu_t, a_t = ref.caps_em_routing(
            torch.tensor(votes).double(),
            torch.tensor(a_in[:, :, None]).double(), C_out, ref.eps)
    mu_ref = mu_t.numpy().reshape(n, C_out, P * P)
    a_ref = a_t.numpy().reshape(n, C_out)

    from shgvqa_tpu.models.capsules import _em_routing_reference

    with jax.enable_x64(True):
        mu_ours, a_ours = _em_routing_reference(
            jnp.asarray(votes, jnp.float64), jnp.asarray(a_in, jnp.float64),
            jnp.asarray(ref.beta_u.detach().numpy()),
            jnp.asarray(ref.beta_a.detach().numpy()),
            iters=3, eps=ref.eps)
        np.testing.assert_allclose(np.asarray(mu_ours), mu_ref,
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(a_ours), a_ref,
                                   rtol=1e-9, atol=1e-9)


def test_em_routing_variant_param_shapes():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shgvqa_tpu.models.capsules import EMRouting

    poses = jnp.asarray(np.random.RandomState(0).randn(3, 5, 16), jnp.float32)
    acts = jnp.ones((3, 5), jnp.float32)
    for variant, beta_shape in (("hinton", (4,)), ("reference", (4, 16))):
        m = EMRouting(c_out=4, pose_dim=4, variant=variant)
        p = m.init(jax.random.PRNGKey(0), poses, acts)
        assert p["params"]["beta_u"].shape == beta_shape
        mu, a = m.apply(p, poses, acts)
        assert mu.shape == (3, 4, 16) and a.shape == (3, 4)
        assert np.isfinite(np.asarray(mu)).all()
