"""Map checkpoint / resume.

The reference cannot save or reload its map (SURVEY.md §5: "Checkpoint /
resume: None").  Here the whole array-ized map state — keyframe poses and
features, landmark tensors, flat observation tables, covisibility counts —
is serialized to one compressed npz, enabling restart, offline global BA,
and map merging.
"""

from __future__ import annotations

import numpy as np

from ..backend.mapping import KeyframeRecord, MapHandler, _ObsTable

_KF_FIELDS = [
    "pt_uv", "pt_P", "pt_desc", "pt_sigma2", "pt_valid", "pt_lm",
    "ls_sp", "ls_ep", "ls_sP", "ls_eP", "ls_NDc", "ls_desc", "ls_sigma2",
    "ls_valid", "ls_lm",
]


def _obs_triples(table: _ObsTable) -> np.ndarray:
    """Live (lm, kf, feat) rows in insertion order."""
    live = np.where(table.valid[: table.n])[0]
    return np.stack([table.lm[live], table.kf[live], table.fi[live]],
                    axis=1) if len(live) else np.zeros((0, 3), np.int64)


def _restore_obs(triples: np.ndarray, n_lm: int):
    """Rebuild a flat obs table + obs counts (the per-landmark row index
    is lazy inside _ObsTable)."""
    table = _ObsTable(max(1024, len(triples)))
    n = len(triples)
    if n:
        table.lm[:n] = triples[:, 0]
        table.kf[:n] = triples[:, 1]
        table.fi[:n] = triples[:, 2]
        table.valid[:n] = True
    table.n = n
    nobs = np.bincount(triples[:, 0], minlength=n_lm).astype(np.int64) \
        if n else np.zeros(n_lm, np.int64)
    return table, nobs


def _lc_state(lc) -> dict:
    """Loop-closer state worth persisting: the trained vocabulary(ies),
    per-KF BoW records, and the confusion matrix — rebuilding the conf
    matrix on resume is O(K^2) BoW scoring and retraining the vocabulary
    is minutes of k-means (VERDICT round-1 #9)."""
    data: dict = {}
    if lc is None or lc.voc is None:
        return data
    data["lc_conf"] = lc.conf
    data["lc_closed_at"] = np.asarray(lc.closed_at)
    for name, voc in (("p", lc.voc), ("l", lc.voc_l)):
        if voc is None:
            continue
        data[f"lc_voc_{name}_meta"] = np.asarray([voc.k, voc.depth])
        for i, lvl in enumerate(voc.levels):
            data[f"lc_voc_{name}_level{i}"] = np.asarray(lvl)
        if voc.word_weight is not None:
            data[f"lc_voc_{name}_ww"] = np.asarray(voc.word_weight)
    if lc.bow:
        data["lc_bow_p"] = np.stack([b["p"] for b in lc.bow])
        data["lc_bow_meta"] = np.asarray(
            [[b["n_pt"], b["std_pt"], b["n_ls"], b["std_ls"]]
             for b in lc.bow], np.float64)
        if all(b["l"] is not None for b in lc.bow):
            data["lc_bow_l"] = np.stack([b["l"] for b in lc.bow])
    return data


def _restore_lc(z, lc) -> None:
    import jax
    import jax.numpy as jnp

    from ..backend import vocab as vocab_mod

    if lc is None or "lc_conf" not in z.files:
        return
    lc.conf = z["lc_conf"].copy()
    lc.closed_at = int(z["lc_closed_at"])
    for name in ("p", "l"):
        if f"lc_voc_{name}_meta" not in z.files:
            continue
        k, depth = (int(x) for x in z[f"lc_voc_{name}_meta"])
        levels = tuple(jnp.asarray(z[f"lc_voc_{name}_level{i}"])
                       for i in range(depth))
        ww = (jnp.asarray(z[f"lc_voc_{name}_ww"])
              if f"lc_voc_{name}_ww" in z.files else None)
        voc = vocab_mod.Vocabulary(levels=levels, k=k, depth=depth,
                                   word_weight=ww)
        if name == "p":
            lc.voc = voc
            lc._tf = jax.jit(lambda d, v, _voc=voc:
                             vocab_mod.transform(_voc, d, v))
        else:
            lc.voc_l = voc
            lc._tf_l = jax.jit(lambda d, v, _voc=voc:
                               vocab_mod.transform(_voc, d, v))
    lc.bow = []
    if "lc_bow_p" in z.files:
        P = z["lc_bow_p"]
        meta = z["lc_bow_meta"]
        L = z["lc_bow_l"] if "lc_bow_l" in z.files else None
        for i in range(len(P)):
            lc.bow.append({
                "p": P[i], "l": None if L is None else L[i],
                "n_pt": int(meta[i, 0]), "std_pt": float(meta[i, 1]),
                "n_ls": int(meta[i, 2]), "std_ls": float(meta[i, 3])})


def save_map(path: str, mapper: MapHandler, loop_closer=None) -> None:
    mp = mapper.map
    data = {
        "covis": mp.covis,
        "pt_w": np.asarray(mp.pt_w), "pt_desc": np.asarray(mp.pt_desc),
        "pt_valid": np.asarray(mp.pt_valid),
        "pt_first_kf": np.asarray(mp.pt_first_kf),
        "pt_last_kf": np.asarray(mp.pt_last_kf),
        "ls_w": np.asarray(mp.ls_w), "ls_epw": np.asarray(mp.ls_epw),
        "ls_desc": np.asarray(mp.ls_desc),
        "ls_valid": np.asarray(mp.ls_valid),
        "ls_first_kf": np.asarray(mp.ls_first_kf),
        "ls_last_kf": np.asarray(mp.ls_last_kf),
        "n_kf": np.asarray(len(mp.keyframes)),
        "pt_obs": _obs_triples(mp.pobs),
        "ls_obs": _obs_triples(mp.lobs),
    }
    for i, kf in enumerate(mp.keyframes):
        data[f"kf{i}_pose"] = kf.T_w_k
        data[f"kf{i}_active"] = np.asarray(kf.active)
        for f in _KF_FIELDS:
            data[f"kf{i}_{f}"] = getattr(kf, f)
    data.update(_lc_state(loop_closer))
    np.savez_compressed(path, **data)


def load_map(path: str, mapper: MapHandler,
             loop_closer=None) -> MapHandler:
    """Restore map state in place (mapper supplies cam + configs)."""
    z = np.load(path, allow_pickle=False)
    mp = mapper.map
    # covis goes straight into the capacity buffer: the (K, K) view (and
    # its setter) is sized by len(keyframes), which is rebuilt below
    K = int(z["n_kf"])
    cap = 16
    while cap < K:
        cap *= 2
    mp._covis_buf = np.zeros((cap, cap), np.int32)
    mp._covis_buf[:K, :K] = z["covis"]
    mp.n_pt = len(z["pt_valid"])
    mp._pt_w = z["pt_w"].copy()
    mp._pt_desc = z["pt_desc"].copy()
    mp._pt_valid = z["pt_valid"].copy()
    mp._pt_first_kf = z["pt_first_kf"].copy()
    mp._pt_last_kf = z["pt_last_kf"].copy()
    mp.n_ls = len(z["ls_valid"])
    mp._ls_w = z["ls_w"].copy()
    mp._ls_epw = (z["ls_epw"].copy() if "ls_epw" in z.files
                  else np.zeros((mp.n_ls, 2, 3)))
    mp._ls_desc = z["ls_desc"].copy()
    mp._ls_valid = z["ls_valid"].copy()
    mp._ls_first_kf = z["ls_first_kf"].copy()
    mp._ls_last_kf = z["ls_last_kf"].copy()
    mp.pobs, nobs = _restore_obs(z["pt_obs"].astype(np.int64), mp.n_pt)
    mp._pt_nobs = nobs
    mp.lobs, nobs = _restore_obs(z["ls_obs"].astype(np.int64), mp.n_ls)
    mp._ls_nobs = nobs
    mp.keyframes = []
    for i in range(int(z["n_kf"])):
        kf = KeyframeRecord.__new__(KeyframeRecord)
        kf.id = i
        kf.T_w_k = z[f"kf{i}_pose"]
        kf.active = bool(z[f"kf{i}_active"]) if f"kf{i}_active" in z else True
        for f in _KF_FIELDS:
            setattr(kf, f, z[f"kf{i}_{f}"].copy())
        kf.dev = None
        mp.keyframes.append(kf)
    _restore_lc(z, loop_closer)
    return mapper
