import numpy as np

from holoscene_tpu.physics import sim_validation
from holoscene_tpu.physics.sim import QuasiStaticProvider, settle_drop
from holoscene_tpu.utils.mesh import Mesh


def _box(center, half, n=6):
    """Triangulated box mesh."""
    c = np.asarray(center, dtype=float)
    h = np.asarray(half, dtype=float)
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    ) * h + c
    faces = []
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    for a, b, cc, d in quads:
        faces.append([a, b, cc])
        faces.append([a, cc, d])
    return Mesh(corners, np.array(faces))


def test_supported_box_is_stable():
    """y-down world: the floor is at +y; a box resting on it is stable."""
    floor = _box((0, 0.55, 0), (1.0, 0.05, 1.0))
    box = _box((0, 0.3, 0), (0.2, 0.2, 0.2))  # bottom at y=0.5 touches floor
    prov = QuasiStaticProvider(contact_eps=0.03)
    res = prov.sim_validation([floor, box])
    assert res.stable
    assert res.drift_deg < 8.0


def test_overhanging_box_is_unstable():
    # tiny pedestal at the box's far edge: COM projects outside the support
    pedestal = _box((0.19, 0.55, 0.19), (0.02, 0.05, 0.02))
    box = _box((0, 0.3, 0), (0.2, 0.2, 0.2))
    prov = QuasiStaticProvider(contact_eps=0.03)
    res = prov.sim_validation([pedestal, box])
    assert not res.stable
    assert res.drift_deg >= 8.0


def test_floating_box_is_unstable():
    floor = _box((0, 0.9, 0), (1.0, 0.05, 1.0))
    box = _box((0, 0.0, 0), (0.1, 0.1, 0.1))  # hovering far above the floor
    res = sim_validation([floor, box])
    try:
        import mujoco  # noqa: F401

        # dynamics (reference semantics): the box falls, lands flat, and is
        # orientation-stable — but the recorded translation exposes the drop
        assert float(np.linalg.norm(res.translation)) > 0.5
    except ImportError:
        # quasi-static oracle: no supporting contact -> unstable
        assert not res.stable and res.drift_deg > 8.0
    # the quasi-static oracle always flags the missing support
    qres = QuasiStaticProvider(contact_eps=0.03).sim_validation([floor, box])
    assert not qres.stable and qres.drift_deg > 8.0


def test_settle_drop_moves_to_contact():
    floor = _box((0, 1.0, 0), (1.0, 0.05, 1.0))  # top surface at y=0.95
    box = _box((0, 0.3, 0), (0.1, 0.1, 0.1))  # bottom at y=0.4
    t = settle_drop(box, [floor])
    # should drop ~0.55 (from y=0.4 down to y=0.95) along +y
    assert t[1] > 0.4
    assert abs(t[0]) < 1e-9 and abs(t[2]) < 1e-9


class TestMuJoCoProvider:
    """Dynamic stability validation (replaces the round-1 IsaacSim stub;
    reference sim_validation semantics, utils/sim.py:606-636)."""

    def _box(self, center, half):
        import numpy as np

        from holoscene_tpu.utils.mesh import Mesh

        c = np.asarray(center, float)
        h = np.asarray(half, float)
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        v = c[None] + corners * h[None]
        f = np.array(
            [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5],
             [0, 5, 1], [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4],
             [1, 5, 7], [1, 7, 3]]
        )
        return Mesh(v.astype("float32"), f.astype("int32"))

    def test_resting_box_is_stable(self):
        import pytest

        pytest.importorskip("mujoco")
        from holoscene_tpu.physics.sim import MuJoCoProvider

        # y-down world: floor slab below means LARGER y
        floor = self._box([0, 0.55, 0], [1.0, 0.05, 1.0])
        box = self._box([0, 0.4, 0], [0.1, 0.1, 0.1])
        res = MuJoCoProvider()._simulate([floor, box])
        assert res.stable and res.drift_deg < 2.0, res

    def test_floating_box_falls_and_tilted_slab_topples(self):
        import numpy as np
        import pytest

        pytest.importorskip("mujoco")
        from holoscene_tpu.physics.sim import MuJoCoProvider

        floor = self._box([0, 0.55, 0], [1.0, 0.05, 1.0])
        # tall thin slab standing on its narrow edge, shifted COM: dynamic
        # toppling that a single-frame support-polygon test can miss
        slab = self._box([0, 0.2, 0], [0.3, 0.3, 0.01])
        verts = slab.vertices.copy()
        # tilt 20 deg about x so it must fall over
        th = np.radians(20.0)
        R = np.array(
            [[1, 0, 0],
             [0, np.cos(th), -np.sin(th)],
             [0, np.sin(th), np.cos(th)]]
        )
        c = verts.mean(0)
        from holoscene_tpu.utils.mesh import Mesh

        tilted = Mesh(((verts - c) @ R.T + c).astype("float32"), slab.faces)
        # move it so its lowest point touches the floor top
        dy = 0.5 - tilted.vertices[:, 1].max()
        tilted = Mesh(
            (tilted.vertices + np.array([0, dy, 0])).astype("float32"),
            tilted.faces,
        )
        res = MuJoCoProvider()._simulate([floor, tilted])
        assert not res.stable and res.drift_deg > 8.0, res

    def test_room_support_becomes_floor_plane(self):
        import numpy as np
        import pytest

        pytest.importorskip("mujoco")
        from holoscene_tpu.physics.sim import MuJoCoProvider

        # room box enclosing the candidate: hull would swallow it; provider
        # must substitute the floor plane and still report stability
        room = self._box([0, 0, 0], [1.0, 0.6, 1.0])
        box = self._box([0, 0.45, 0], [0.1, 0.15, 0.1])
        res = MuJoCoProvider()._simulate([room, box])
        assert res.stable, res
        assert np.linalg.norm(res.translation) < 0.1
