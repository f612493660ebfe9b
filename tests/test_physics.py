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
    assert not res.stable
    assert res.drift_deg > 8.0


def test_settle_drop_moves_to_contact():
    floor = _box((0, 1.0, 0), (1.0, 0.05, 1.0))  # top surface at y=0.95
    box = _box((0, 0.3, 0), (0.1, 0.1, 0.1))  # bottom at y=0.4
    t = settle_drop(box, [floor])
    # should drop ~0.55 (from y=0.4 down to y=0.95) along +y
    assert t[1] > 0.4
    assert abs(t[0]) < 1e-9 and abs(t[2]) < 1e-9
