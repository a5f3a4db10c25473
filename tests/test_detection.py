"""Feature-detection op tests on synthetic images: FAST finds known
corners, the line detector recovers known segments, descriptors match
across a shifted rendering (SURVEY.md §4 golden-value strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from plslam_tpu.ops import fast, lbd, lines, orb
from plslam_tpu.ops.descriptors import hamming_distance_matrix


def checkerboard(h=240, w=320, sq=40, shift=(0, 0)):
    """Grid of isolated bright squares — their corners are FAST-9 L-corners
    (ideal checkerboard X-corners have only 8 contiguous ring pixels and are
    correctly rejected by FAST)."""
    yy, xx = np.mgrid[0:h, 0:w]
    ym = ((yy + shift[1]) % sq) < sq // 2
    xm = ((xx + shift[0]) % sq) < sq // 2
    img = np.where(ym & xm, 220.0, 20.0)
    return jnp.asarray(img, jnp.float32)


def synthetic_lines_img(h=240, w=320, segs=None):
    """Dark background with bright thick line segments."""
    img = np.full((h, w), 20.0, np.float32)
    if segs is None:
        segs = [((40, 40), (280, 60)), ((60, 200), (260, 120)),
                ((150, 30), (150, 210))]
    for (x0, y0), (x1, y1) in segs:
        n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2)
        for t in np.linspace(0, 1, n):
            x = x0 + t * (x1 - x0)
            y = y0 + t * (y1 - y0)
            xi, yi = int(round(x)), int(round(y))
            img[max(0, yi - 1):yi + 2, max(0, xi - 1):xi + 2] = 220.0
    return jnp.asarray(img), segs


def test_fast_finds_checkerboard_corners():
    img = checkerboard()
    kp = jax.jit(lambda im: fast.detect_level(im, 20.0, 128, 8))(img)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert len(xy) >= 20
    # every detection near a true corner (multiples of sq=40)
    offs = np.abs((xy + 10) % 20 - 10)
    dist = np.max(offs, axis=1)
    assert np.median(dist) <= 3.0, np.median(dist)


def test_fast_flat_image_no_corners():
    img = jnp.full((120, 160), 50.0, jnp.float32)
    kp = jax.jit(lambda im: fast.detect_level(im, 20.0, 64, 8))(img)
    assert not bool(jnp.any(kp.valid))


def test_orb_descriptors_match_across_shift():
    """Same corners rendered with a 3px shift: descriptors of corresponding
    corners must be much closer than non-corresponding ones."""
    img1 = checkerboard()
    img2 = checkerboard(shift=(3, 0))
    det = jax.jit(lambda im: fast.detect_level(im, 20.0, 96, 16))
    kp1 = det(img1)
    kp2 = det(img2)
    desc_fn = jax.jit(orb.describe)
    d1, _ = desc_fn(img1, kp1.xy, kp1.valid)
    d2, _ = desc_fn(img2, kp2.xy, kp2.valid)
    dist = np.asarray(jax.jit(hamming_distance_matrix)(d1, d2))
    v1 = np.asarray(kp1.valid)
    v2 = np.asarray(kp2.valid)
    xy1 = np.asarray(kp1.xy)
    xy2 = np.asarray(kp2.xy)
    # ground-truth correspondence: |p1 - (p2 - (3,0))| small
    hits = 0
    total = 0
    for i in np.where(v1)[0]:
        gt = np.where(v2 & (np.abs(xy2[:, 0] + 3 - xy1[i, 0]) < 2)
                      & (np.abs(xy2[:, 1] - xy1[i, 1]) < 2))[0]
        if len(gt) == 0:
            continue
        total += 1
        if dist[i][v2].min() == dist[i][gt].min():
            hits += 1
    assert total >= 10
    assert hits / total > 0.7, (hits, total)


def test_line_detector_recovers_segments():
    img, segs = synthetic_lines_img()
    out = jax.jit(lambda im: lines.detect_segments(im))(img)
    sp = np.asarray(out.sp)[np.asarray(out.valid)]
    ep = np.asarray(out.ep)[np.asarray(out.valid)]
    ln = np.asarray(out.length)[np.asarray(out.valid)]
    assert len(sp) >= 3
    # for each true segment there must be a detection covering >50% of it
    for (x0, y0), (x1, y1) in segs:
        a = np.array([x0, y0], float)
        b = np.array([x1, y1], float)
        d = b - a
        L = np.linalg.norm(d)
        dhat = d / L
        best_cover = 0.0
        for s, e in zip(sp, ep):
            # angle agreement
            dd = e - s
            ll = np.linalg.norm(dd)
            if ll < 10:
                continue
            cosang = abs(dd @ dhat) / ll
            if cosang < 0.98:
                continue
            # normal distance of detected midpoint
            mid = 0.5 * (s + e)
            normal = abs((mid - a) @ np.array([-dhat[1], dhat[0]]))
            if normal > 4.0:
                continue
            t0 = np.clip((s - a) @ dhat / L, 0, 1)
            t1 = np.clip((e - a) @ dhat / L, 0, 1)
            best_cover = max(best_cover, abs(t1 - t0))
        assert best_cover > 0.5, ((x0, y0, x1, y1), best_cover)


def test_merge_components_path_graph_worst_case():
    # A chain of N collinear cell-segments where only CONSECUTIVE pairs are
    # mergeable (gap 3 px <= gap_merge, but 13 px between i and i+2) — a
    # path graph, the worst case for the label-propagation component
    # labeling that replaced the boolean-matmul closure.  All N must
    # collapse into ONE segment spanning the full extent.
    cfg = lines.LineDetectorConfig(max_out=8)
    N = 64
    xs = 10.0 * np.arange(N)
    sp = np.stack([xs, np.zeros(N)], axis=-1)
    ep = np.stack([xs + 7.0, np.zeros(N)], axis=-1)
    d = np.tile(np.array([[1.0, 0.0]]), (N, 1))
    mass = np.ones(N)
    out = jax.jit(lambda a, b, c, m, v: lines._merge_components(
        a, b, c, m, v, cfg))(
        jnp.asarray(sp, jnp.float32), jnp.asarray(ep, jnp.float32),
        jnp.asarray(d, jnp.float32), jnp.asarray(mass, jnp.float32),
        jnp.ones(N, bool))
    valid = np.asarray(out.valid)
    assert valid.sum() == 1
    s, e = np.asarray(out.sp)[valid][0], np.asarray(out.ep)[valid][0]
    lo, hi = min(s[0], e[0]), max(s[0], e[0])
    assert lo < 1.0 and hi > 10.0 * (N - 1) + 6.0
    np.testing.assert_allclose([s[1], e[1]], 0.0, atol=1e-3)


def test_lbd_descriptors_match_across_shift():
    """Describe the same physical segments in two shifted renders: the
    corresponding descriptor must be the Hamming nearest neighbor.  (Uses
    ground-truth segments so the test isolates descriptor invariance from
    detector fragmentation.)"""
    img1, segs = synthetic_lines_img()
    shift = 4
    img2, _ = synthetic_lines_img(
        segs=[((x0 + shift, y0), (x1 + shift, y1)) for (x0, y0), (x1, y1) in segs])
    sp1 = jnp.asarray([[x0, y0] for (x0, y0), _ in segs], jnp.float32)
    ep1 = jnp.asarray([[x1, y1] for _, (x1, y1) in segs], jnp.float32)
    sp2 = sp1 + jnp.asarray([shift, 0.0])
    ep2 = ep1 + jnp.asarray([shift, 0.0])
    v = jnp.ones(len(segs), bool)
    d1 = jax.jit(lbd.describe)(img1, sp1, ep1, v)
    d2 = jax.jit(lbd.describe)(img2, sp2, ep2, v)
    dist = np.asarray(jax.jit(hamming_distance_matrix)(d1, d2))
    # each segment's own counterpart is its nearest neighbor, by a margin
    for i in range(len(segs)):
        others = np.delete(dist[i], i)
        assert dist[i, i] < others.min(), (i, dist)
        assert dist[i, i] <= 40, (i, dist[i, i])
