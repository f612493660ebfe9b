import jax
import jax.numpy as jnp
import numpy as np

from holoscene_tpu.utils.plots import extract_object_meshes, generate_bbox


@jax.jit
def two_object_sdf(pts):
    """Object 0: box room shell (inverted sphere), object 1: small sphere."""
    bg = 0.9 - jnp.linalg.norm(pts, axis=-1)  # inside-positive background
    obj = jnp.linalg.norm(pts - jnp.array([0.3, 0.0, 0.0]), axis=-1) - 0.2
    return jnp.stack([bg, obj], axis=-1)


def test_extract_object_meshes_and_bbox(tmp_path):
    meshes = extract_object_meshes(
        two_object_sdf, num_objects=2, resolution=48, coarse_resolution=24,
        chunk=8192,
    )
    assert meshes[0] is not None and meshes[1] is not None
    # object 1: sphere radius 0.2 at x=0.3
    v1 = meshes[1].vertices
    d = np.linalg.norm(v1 - np.array([0.3, 0.0, 0.0]), axis=1)
    np.testing.assert_allclose(d.mean(), 0.2, atol=0.02)
    # bbox artifact
    bboxes = generate_bbox(meshes, str(tmp_path))
    assert (tmp_path / "bbox" / "bbox_1.json").exists()
    c = np.asarray(bboxes[1]["center"])
    np.testing.assert_allclose(c, [0.3, 0, 0], atol=0.05)


def test_empty_object_returns_none():
    @jax.jit
    def sdf(pts):
        near = jnp.linalg.norm(pts, axis=-1) - 0.3
        far = jnp.full_like(near, 1.0)  # never negative -> empty
        return jnp.stack([near, far], axis=-1)

    meshes = extract_object_meshes(sdf, 2, resolution=32, coarse_resolution=16,
                                   chunk=4096)
    assert meshes[0] is not None
    assert meshes[1] is None
