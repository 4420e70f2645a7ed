"""Photon-record post-processing: PhotonBatch construction, string/OM-id
remapping, and npz round-trip (the photon-level checkpoint).

The reference remaps device string/DOM indices to detector IDs when photons
are downloaded (I3CLSimStepToPhotonConverterOpenCL.cxx:1563-1614) and
persists photons between the two pipeline halves so hit generation can run
later / elsewhere (I3CLSimMakePhotons -> .i3 file ->
I3CLSimMakeHitsFromPhotons, python/traysegments/I3CLSimMakeHitsFromPhotons
.py:55; serialization contract I3CLSimStep.h:150-175).  Here the photon
record rings from the propagation result become a compact PhotonBatch with
real (string_id, om_id) pairs, and save/load is a plain npz file.
"""

from __future__ import annotations

import numpy as np

from ..geometry import DetectorGeometry
from ..types import PhotonBatch

_SCALAR_FIELDS = [
    "pos_x", "pos_y", "pos_z", "time", "dir_theta", "dir_phi",
    "wavelength", "cherenkov_dist", "num_scatters", "weight",
    "identifier", "start_x", "start_y", "start_z", "start_time",
    "start_theta", "start_phi", "group_velocity", "dist_in_abs_lens",
]


def records_to_photon_batch(rec: dict, rec_count, geo: DetectorGeometry
                            ) -> PhotonBatch:
    """Compact the per-slot record rings into a flat PhotonBatch.

    Ring semantics: slot s holds min(rec_count[s], capacity) valid records
    in ring order; overflowed slots wrapped (oldest records overwritten),
    exactly like the reference's bounded output buffer with its overflow
    clamp (…OpenCL.cxx:1027-1031).  Device flat DOM indices are remapped to
    detector (string_id, om_id) pairs here, on download.
    """
    count = np.asarray(rec_count)
    n_slots, cap = np.asarray(rec["time"]).shape
    valid = (np.arange(cap)[None, :] < np.minimum(count, cap)[:, None])
    mask = valid.reshape(-1)

    flat = {k: np.asarray(v).reshape(-1)[mask] for k, v in rec.items()
            if k in _SCALAR_FIELDS or k == "dom"}
    dom = flat.pop("dom").astype(np.int64)
    string_id = np.asarray(geo.dom_string_id)[dom]
    om_id = np.asarray(geo.dom_om_id)[dom]

    return PhotonBatch(
        valid=np.ones(mask.sum(), bool),
        string_id=string_id.astype(np.int32),
        om_id=om_id.astype(np.int32),
        **{k: flat[k] for k in _SCALAR_FIELDS})


def photon_batch_dom_index(batch: PhotonBatch, geo: DetectorGeometry):
    """Inverse remap: (string_id, om_id) -> flat DOM index in `geo`
    (what the device needs again when hits are generated from a file)."""
    sid = np.asarray(geo.dom_string_id, np.int64)
    oid = np.asarray(geo.dom_om_id, np.int64)
    code = sid * 100000 + oid
    order = np.argsort(code, kind="stable")
    want = (np.asarray(batch.string_id, np.int64) * 100000
            + np.asarray(batch.om_id, np.int64))
    pos = np.searchsorted(code[order], want)
    pos = np.clip(pos, 0, len(code) - 1)
    idx = order[pos]
    if not (code[idx] == want).all():
        raise ValueError("photon batch references (string, om) pairs not in "
                         "this geometry")
    return idx.astype(np.int32)


def save_photons_npz(path, batch: PhotonBatch) -> None:
    """Persist a PhotonBatch (the MakePhotons half of the two-phase flow)."""
    np.savez_compressed(
        path, **{f: np.asarray(getattr(batch, f))
                 for f in PhotonBatch._fields})


def load_photons_npz(path) -> PhotonBatch:
    with np.load(path) as z:
        return PhotonBatch(**{f: z[f] for f in PhotonBatch._fields})
