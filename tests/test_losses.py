import jax.numpy as jnp
import numpy as np
import pytest

from holoscene_tpu.losses.holoscene_loss import (
    bg_render_loss,
    depth_loss,
    eikonal_loss,
    normal_loss,
    object_distinct_graph_loss,
    object_distinct_loss,
    object_opacity_loss,
    scale_shift_solve,
    smooth_loss,
)


def test_eikonal_zero_for_unit_gradients():
    g = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (10, 1))
    assert float(eikonal_loss(g)) == pytest.approx(0.0, abs=1e-10)
    g2 = g * 2.0
    assert float(eikonal_loss(g2)) == pytest.approx(1.0, rel=1e-6)


def test_smooth_loss_zero_for_identical():
    g = jnp.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0]])
    assert float(smooth_loss(g, g)) == pytest.approx(0.0, abs=1e-6)
    g_flip = -g
    assert float(smooth_loss(g, g_flip)) == pytest.approx(2.0, rel=1e-5)


def test_scale_shift_solver_recovers_affine():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.5, 2.0, 64))
    gt = 3.0 * pred + 0.7
    w, q = scale_shift_solve(pred, gt)
    assert float(w) == pytest.approx(3.0, rel=1e-4)
    assert float(q) == pytest.approx(0.7, rel=1e-3)
    assert float(depth_loss(pred, gt)) == pytest.approx(0.0, abs=1e-6)


def test_depth_loss_clipped():
    pred = jnp.array([0.0, 0.0, 0.0, 100.0])
    gt = jnp.array([0.0, 1.0, -1.0, 0.0])
    assert float(depth_loss(pred, gt)) <= 1.0


def test_normal_loss_golden():
    n = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
    l1, cos = normal_loss(n, n)
    assert float(l1) == pytest.approx(0.0, abs=1e-6)
    assert float(cos) == pytest.approx(0.0, abs=1e-6)
    l1f, cosf = normal_loss(n, -n)
    assert float(cosf) == pytest.approx(2.0, rel=1e-5)


def test_object_opacity_loss_prefers_correct_object():
    gt = jnp.array([1, 1, 1, 1], dtype=jnp.int32)
    good = jnp.array([[0.01, 0.99, 0.01]] * 4)
    bad = jnp.array([[0.99, 0.01, 0.01]] * 4)
    assert float(object_opacity_loss(good, gt)) < float(object_opacity_loss(bad, gt))


def test_object_distinct_loss_detects_overlap():
    # point inside two objects simultaneously: sdf both negative
    sdf_overlap = jnp.array([[-0.2, -0.1, 0.5]])
    min_sdf = sdf_overlap.min(axis=1)
    loss = object_distinct_loss(sdf_overlap, min_sdf)
    assert float(loss) > 0
    # disjoint: only one negative
    sdf_ok = jnp.array([[-0.2, 0.3, 0.5]])
    loss_ok = object_distinct_loss(sdf_ok, sdf_ok.min(axis=1))
    assert float(loss_ok) == pytest.approx(0.0, abs=1e-8)


def test_object_distinct_graph_loss_parent_child():
    # point outside the parent's solid (parent sdf > 0): parent term inactive
    sdf = jnp.array([[0.3, -0.1, 0.8]])
    p, d, b = object_distinct_graph_loss(
        sdf, obj_i=1, parent_id=0, desc_ids=(), bother_groups=((2,),)
    )
    assert float(p) == pytest.approx(0.0, abs=1e-8)
    assert float(b) == pytest.approx(0.0, abs=1e-8)

    # point inside the parent's solid AND inside the child: violation
    # (reference loss.py:427: -s_child - s_parent > 0 when parent sdf < 0)
    sdf_pen = jnp.array([[-0.5, -0.1, 0.8]])
    p2, _, _ = object_distinct_graph_loss(
        sdf_pen, obj_i=1, parent_id=0, desc_ids=(), bother_groups=((2,),)
    )
    assert float(p2) == pytest.approx(0.6, rel=1e-5)

    # sibling overlap: both 1 and 2 negative
    sdf2 = jnp.array([[0.5, -0.3, -0.2]])
    _, _, b2 = object_distinct_graph_loss(
        sdf2, obj_i=1, parent_id=0, desc_ids=(), bother_groups=((2,),)
    )
    assert float(b2) > 0


def test_bg_render_loss_smooth_is_zero():
    depth = jnp.ones((32 * 32, 1))
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32 * 32, 1))
    mask = jnp.ones((32 * 32, 1))
    assert float(bg_render_loss(depth, normal, mask)) == pytest.approx(0.0, abs=1e-6)
    # a sharp step in masked depth must be penalized
    d2 = depth.reshape(32, 32).at[:, 16:].set(5.0).reshape(-1, 1)
    assert float(bg_render_loss(d2, normal, mask)) > 0
