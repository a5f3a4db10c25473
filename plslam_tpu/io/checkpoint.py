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
    """Rebuild a flat obs table + per-landmark row lists + obs counts."""
    table = _ObsTable(max(1024, len(triples)))
    n = len(triples)
    if n:
        table.lm[:n] = triples[:, 0]
        table.kf[:n] = triples[:, 1]
        table.fi[:n] = triples[:, 2]
        table.valid[:n] = True
    table.n = n
    rows_of: list[list[int]] = [[] for _ in range(n_lm)]
    for r in range(n):
        rows_of[int(triples[r, 0])].append(r)
    nobs = np.bincount(triples[:, 0], minlength=n_lm).astype(np.int64) \
        if n else np.zeros(n_lm, np.int64)
    return table, rows_of, nobs


def save_map(path: str, mapper: MapHandler) -> None:
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
    np.savez_compressed(path, **data)


def load_map(path: str, mapper: MapHandler) -> MapHandler:
    """Restore map state in place (mapper supplies cam + configs)."""
    z = np.load(path, allow_pickle=False)
    mp = mapper.map
    mp.covis = z["covis"]
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
    mp.pobs, mp._pt_rows, nobs = _restore_obs(
        z["pt_obs"].astype(np.int64), mp.n_pt)
    mp._pt_nobs = nobs
    mp.lobs, mp._ls_rows, nobs = _restore_obs(
        z["ls_obs"].astype(np.int64), mp.n_ls)
    mp._ls_nobs = nobs
    mp.keyframes = []
    for i in range(int(z["n_kf"])):
        kf = KeyframeRecord.__new__(KeyframeRecord)
        kf.id = i
        kf.T_w_k = z[f"kf{i}_pose"]
        kf.active = bool(z[f"kf{i}_active"]) if f"kf{i}_active" in z else True
        for f in _KF_FIELDS:
            setattr(kf, f, z[f"kf{i}_{f}"].copy())
        mp.keyframes.append(kf)
    return mapper
