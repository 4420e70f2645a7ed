"""Fused multi-iteration Pallas propagation kernel (the TPU fast path).

Fuses the whole per-iteration pipeline of propagate/engine.py -- photon
creation, tilt + layered-ice optical-depth walk, anisotropy, string-culled
DOM collision, hit recording and scattering -- into ONE Pallas kernel that
runs `iters_per_call` iterations per launch with all photon state resident
in VMEM.  The physics contract is identical to the engine (itself the
contract-carrying redesign of the reference's propagation_kernel.c.cl:406-913
+ sparse_collision_kernel.c.cl); the engine doubles as the numerical oracle
for this kernel's tests.

Why fusing wins on TPU: the unfused engine materializes (n_slots, n_strings)
cull arrays and (n_slots, window) layer fetches in HBM every iteration
(~200 MB/iter at 64k slots) and pays XLA op-dispatch per iteration.  Here
every temporary lives in VMEM for a block of `block_lanes` photons.

Measured layout rules (scripts/probe_pallas*.py on a v5e through the axon
relay; round-3 additions at the end):
  * elementwise math on (RB, 128)-shaped lanes is ~free; (1, BLK)-flat ops
    run at 1/8 VPU -- so state lives tiled and is flattened only for the
    table/cull phases (reshape is cheap);
  * one-hot MXU fetches must be bf16: an f32 one-hot matmul runs ~12x slower
    AND this backend's MXU rounds f32 matmul outputs to bfloat16 anyway.
    Tables are therefore fetched as hi+lo bf16 split pairs (error ~2^-16
    relative, exact for integers < 2^16) -- see _split2;
  * small per-lane table searches (spectrum CDF, bias interp, tilt distance)
    are dense compares / mask-reduces on (rows, BLK) arrays (lane broadcasts
    of (rows, 1) columns are supported and cheap);
  * jnp.cumsum does not lower -- lane scans use pltpu.roll steps;
  * hit deposit: hits park in per-lane pending registers and flush to a
    compacted per-block queue every `flush_every` iterations (a lane that
    hit is dead under stop-on-detection, so one register per lane suffices;
    respawn is gated on an empty register).  The flush builds a sublane
    one-hot (rows, BLK) against roll-scanned positions and lane-reduces --
    replacing the reference's device-atomic hit append
    (propagation_kernel.c.cl:329) with a deterministic scan.  The histogram
    scatter-add runs OUTSIDE the kernel on the compacted queue.

Supported (static) configuration: icecube / water / separable-table
(photonics) media, any number of stacked spectra (flasher source_type
dispatch), tabulated scattering, the stopping "detect" estimator (with or
without photon records -- spec.records adds a second compacted record
queue) and the "expected" differentiable estimator (soft or hard binning).
`fused_supported()` reports whether a config can take this path; api/bench
fall back to the engine otherwise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import C_LIGHT
from ..geometry import DetectorGeometry
from ..medium.properties import MediumProperties
from ..ops.lookup import compact_scatter_add, directional_window_table
from ..ops.spectrum import SpectrumTable
from ..types import PropagationConfig, StepBatch
from .engine import PropagationResult

EPSILON = 1e-5
BIG = 1e30
LANES = 128

# Per-photon wavelength-derived quantities (bias weight w0, scattering
# coefficient scale gs, absorption coefficients pa/qa/ra, group slowness)
# are computed ONCE at spawn and carried as state: a photon's wavelength is
# immutable, so hoisting the pow/exp/bias-interp out of the iteration body
# removes ~15% of per-iteration vector work with bit-identical physics.
STATE_FIELDS = ["photons_left", "in_flight", "x", "y", "z", "t",
                "dx", "dy", "dz", "w0", "inv_gv", "abs_left",
                "gs", "pa", "qa", "ra", "pend_idx", "pend_w"]
NSF = len(STATE_FIELDS)
IDX_PEND_I, IDX_PEND_W = 16, 17

# extra per-lane state carried only in photon-record mode (spec.records):
# everything an I3Photon-parity record needs that the base state lacks.
# A lane is DEAD from hit until its flush (stop-on-detection), so the
# positional fields x/y/z/t freeze at the (corrected) hit values and the
# flush reads them straight from state -- only spawn-time quantities and
# counters need extra slots.
REC_STATE_FIELDS = ["wlen", "start_x", "start_y", "start_z", "start_t",
                    "sdx", "sdy", "sdz", "n_scat", "abs_init", "dist_abs"]
NRSF = len(REC_STATE_FIELDS)

# f32 rows per record-queue entry (dom/tbin and weight ride the existing
# qidx/qw queues; theta/phi and derived fields are converted on the host)
REC_QUEUE_FIELDS = ["pos_x", "pos_y", "pos_z", "time", "dir_x", "dir_y",
                    "dir_z", "wavelength", "identifier", "start_x",
                    "start_y", "start_z", "start_time", "start_dx",
                    "start_dy", "start_dz", "inv_gv", "num_scatters",
                    "dist_in_abs_lens"]
NRQ = len(REC_QUEUE_FIELDS)

STEP_FIELDS = ["x", "y", "z", "t", "dir_x", "dir_y", "dir_z",
               "length", "beta", "weight", "source_type", "identifier"]
NST = len(STEP_FIELDS)

# scalar-parameter vector layout (SMEM f32)
(PF_Z_START, PF_LAYER_H, PF_ALPHA, PF_KAPPA, PF_ABS_A, PF_ABS_B, PF_ABS_D,
 PF_ABS_E, PF_AN_CA, PF_AN_SA, PF_AN_K1, PF_AN_K2, PF_AN_KZ, PF_MEAN_COS,
 PF_LIU_FRAC, PF_R2, PF_PANCAKE, PF_MAX_SEG, PF_HIST_T0, PF_INV_HIST_DT,
 PF_TILT_Z0, PF_TILT_INV_DZ, PF_TILT_CA, PF_TILT_SA, PF_BIAS_X0,
 PF_BIAS_INV_DX, PF_N0, PF_N1, PF_N2, PF_N3, PF_N4, PF_G0, PF_G1, PF_G2,
 PF_G3, PF_G4) = range(36)
PF_TILT_D0 = 36        # tilt distance grid: up to 14 entries (36..49)
PF_WTAB_X0 = 50        # water/photonics wavelength-table grid origin
PF_WTAB_INV_DX = 51
PF_UZ_Z0 = 52          # uniform-z geometry: shared DOM z-grid (z0, dz, nd)
PF_UZ_DZ = 53          #   -- lets the affine collision path skip 3 of its
PF_UZ_ND = 54          #   6 per-round winner-feature picks
PF_BIAS_XMAX = 55      # last bias grid point (non-uniform bias clamp)
PF_DOM0_X = 56         # DOM 0 center: the SAVE_ALL record-position origin
PF_DOM0_Y = 57         #   (engine record contract: hit_dom = 0 for
PF_DOM0_Z = 58         #   absorption records)
PF_LEN = 59

(CNT_GEN, CNT_HITS, CNT_WSUM, CNT_DROPPED, CNT_ALIVE, CNT_QUEUED,
 CNT_WORK) = range(7)


class SubPlan(NamedTuple):
    """Static per-subdetector collision plan (hashable; lives inside
    FusedSpec.sub_plans).  The TPU form of the reference's per-subdetector
    cell grids + per-stringset z-layer tables
    (sparse_collision_kernel.c.cl:305-460 DO_CHECK macros,
    I3CLSimHelperGenerateGeometrySource per-stringSet tables): strings are
    grouped by their (z0, dz, nd) DOM grid, each group gets its OWN 2-D
    cell cull, candidate count sized by its own dz, and a test-round count
    PROVEN sufficient by static geometry -- so a dense infill (DeepCore)
    no longer taxes every main-array lane with its fine z-granularity."""
    n_cells: int          # padded cell-table width for this group
    K_cand: int           # padded candidate strings per cell
    x0: float
    y0: float
    inv_cell: float
    nx: int
    ny: int
    n_dom_cand: int       # z-window candidates (from THIS group's dz)
    rounds: int           # closest-string test rounds (static-geometry
                          # bound: > max simultaneous culled strings never
                          # helps, see _max_simultaneous)
    uz_z0: float          # shared DOM z-grid of the group
    uz_dz: float
    uz_nd: float
    minz: float           # z-extent for the cull's pass_z test
    maxz: float
    row_off: int          # first row of this group's block in cell_tab


class FusedSpec(NamedTuple):
    """Static kernel specialization (hashable jit/static argument)."""
    n_blocks: int
    block_lanes: int       # lanes per grid program (multiple of 1024)
    iters_per_call: int
    flush_every: int       # pending-hit flush period (1 in parity mode)
    queue_rows: int        # per-block queue rows of 128 entries
    flush_rows: int        # max queue rows written per flush
    K: int                 # layer-walk window radius
    L: int
    Lpad: int
    Spad: int
    Mpad: int
    n_spec: int            # spectrum table length (per table)
    n_tables: int          # stacked spectra (1 = Cherenkov only; >1 adds
                           # flasher spectra dispatched on step.source_type,
                           # the kernel generateWavelength(sourceType) switch,
                           # propagation_kernel.c.cl:153-183)
    n_bias: int
    bias_uniform: bool = True  # uniform bias grid: index math; else dense
                               # segment-compare locate (same linear interp
                               # as ops/spectrum.wavelength_bias)
    nz_tilt: int = 0       # tilt z-grid points (0 = tilt disabled)
    nd_tilt: int = 0
    aniso: bool = False
    hist_n_bins: int = 512
    splits: int = 2        # bf16 summands per table fetch (2 = ~2^-16 rel)
    external_uniforms: bool = False
    interpret: bool = False
    ablate: str = ""       # comma-joined stage names to skip (perf probes
                           # only; "" in production)
    affine_doms: bool = False  # DOMs sit exactly on vertical strings at
                               # z0 + m*dz: use the analytic candidate-index
                               # sphere test (the TPU form of the reference's
                               # z-layer windowing, sparse_collision_kernel
                               # .c.cl:27-192) instead of all-DOM rows
    n_dom_cand: int = 8        # candidate DOMs per (segment, string)
    spawn_every: int = 1       # run the spawn phase every k-th iteration
                               # (amortizes spectrum sampling; k-1 extra idle
                               # iterations per dead lane, ~(k-1)/2/lifetime
                               # utilization cost; 1 in parity mode)
    n_string_rounds: int = 2   # cfg.strings_per_photon (closest-string test
                               # rounds; the reference checks every culled
                               # string, sparse_collision_kernel.c.cl:462-587)
    # static 2-D cell-grid cull plan (the TPU form of the reference's
    # per-subdetector cell grid, sparse_collision_kernel.c.cl:194-460):
    # per-lane cell index -> one-hot MXU fetch of <= K_cand candidate-string
    # feature rows, replacing the dense all-strings cull
    n_cull_cells: int = 8      # padded nx*ny cell count
    K_cand: int = 8            # padded max candidate strings per cell
    cell_x0: float = 0.0
    cell_y0: float = 0.0
    inv_cell: float = 1.0
    cell_nx: int = 1
    cell_ny: int = 1
    # water ("water") and photonics ("separable_table") media: the separable
    # wavelength factors gs/pa/qa/ra (and optionally the refractive indices)
    # come from uniform-grid tables fetched once per spawn instead of the
    # icecube closed forms (medium/properties.py:119-152)
    medium_tables: bool = False
    n_wtab: int = 0            # wavelength-grid points
    ref_table: bool = False    # phase/group index from the table too
    # tabulated scattering-angle sampling (Petzold phase function mixed with
    # Rayleigh -- MakeAntaresMediumProperties.py:44-95); replaces Liu/HG
    scat_table: bool = False
    n_scat: int = 0
    # expected-value estimator (the differentiable path, engine.py:493-516):
    # photons fly a fixed absorption-length horizon, every DOM crossing
    # deposits w0 * exp(-optical depth) (times the optional static angular
    # acceptance polynomial), optionally soft-binned over two time bins;
    # deposits flush immediately (no pending registers)
    expected: bool = False
    soft: bool = False
    ang_poly: tuple = ()
    pmt_axis: tuple = (0.0, 0.0, -1.0)
    horizon: float = 0.0
    uniform_z: bool = False    # every string shares (z0, dz, nd): the affine
                               # path reads them from pf instead of 3 picks
    records: bool = False      # photon-record mode (cfg.save_photons): extra
                               # REC_STATE_FIELDS state + a second compacted
                               # record queue (saveHit full-record analog,
                               # propagation_kernel.c.cl:307-404)
    rec_all: bool = False      # SAVE_ALL_PHOTONS: record at the ABSORPTION
                               # point with a prescale instead of at hits
                               # (propagation_kernel.c.cl:800-826); record
                               # entries ride the queue with NEGATED weight
                               # so the histogram/host side can tell them
                               # from hit entries
    rec_prescale: float = 1.0
    unroll: int = 1            # inner-loop trips unrolled per fori step:
                               # probe_pallas8 measured ~1.6 us/block of PURE
                               # per-trip loop overhead (carries are free),
                               # so fatter trips amortize it
    sub_plans: tuple = ()      # per-subdetector SubPlans (affine uniform-z
                               # groups); () = legacy single global plan
    stopping: bool = True      # detect: STOP_PHOTONS_ON_DETECTION; False
                               # = the reference's non-stopping detect mode
                               # (hit recorded, photon continues) -- deposits
                               # then flush inline like the expected path
    fixed_abs: bool = False    # detect with a fixed absorption-length
                               # horizon (PROPAGATE_FOR_FIXED_NUMBER_OF_
                               # ABSORPTION_LENGTHS) instead of sampled
    threefry: bool = False     # in-kernel counter-based threefry2x32 RNG,
                               # BIT-EXACT to ops/rng (jax.random.uniform's
                               # partitionable path: per element j of
                               # iteration i, xor of threefry2x32(
                               # fold_in(key, i), (0, j)), bits>>9 mapped to
                               # [0,1)) -- closes the counter-based RNG
                               # contract in the fused kernel and retires
                               # the external uniform stream of the
                               # expected/fit path


def _split_bf16(tab, n):
    """n bf16 summands approximating an f32 table (exact one-hot selection
    error ~2^-8 for n=1, ~2^-16 for n=2; ints < 2^16 exact at n=2),
    ROW-CONCATENATED so a fetch is ONE matmul: Mosaic issues strictly in
    order with no MXU/VPU overlap (scripts/probe_pallas5.py), so two serial
    half-precision dots cost twice the latency of one stacked dot."""
    parts = []
    rem = tab
    for _ in range(n):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        rem = rem - p.astype(jnp.float32)
    return jnp.concatenate(parts, axis=0) if n > 1 else parts[0]


def _fetch(cat, oh_bf16, n_splits=2):
    """(n*C, L) stacked splits @ (L, BLK) one-hot -> folded (C, BLK) f32."""
    d = jnp.dot(cat, oh_bf16, preferred_element_type=jnp.float32)
    if n_splits == 1:
        return d
    C_ = cat.shape[0] // n_splits
    out = d[0:C_]
    for s in range(1, n_splits):
        out = out + d[s * C_:(s + 1) * C_]
    return out


def _min_and_idx(vals, iota):
    mi = jnp.min(vals, axis=0, keepdims=True)
    idx = jnp.max(jnp.where(vals == mi, iota, -1), axis=0, keepdims=True)
    return mi, idx


def _lane_scan_incl(x, width):
    """Inclusive cumsum along the lane axis of a (1, width) f32 row."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    s = 1
    while s < width:
        r = pltpu.roll(x, s, 1)
        x = x + jnp.where(iota >= s, r, 0.0)
        s *= 2
    return x


def _mask_scan_incl(mask_flat, width):
    """Inclusive cumsum of a 0/1 (1, width) mask via ONE exact int8 MXU
    matmul (int8 matmuls accumulate exactly on this target, unlike f32
    whose outputs round to bf16): counts[j] = sum_{i<=j} m[i] is m @ U with
    U upper-triangular ones, plus a short roll-scan of per-row totals.
    Replaces the log2(width)-step flat roll-scan (flat ops run at 1/8 VPU
    and each op pays the in-order fixed issue cost)."""
    rb = width // LANES
    # bool->int8 does not lower on this target; route through f32
    m8 = mask_flat.astype(jnp.float32).reshape(rb, LANES).astype(jnp.int8)
    iu = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    U = (iu <= ju).astype(jnp.int8)
    part = jax.lax.dot_general(m8, U, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)  # (rb, 128)
    totals = part[:, LANES - 1:LANES].astype(jnp.float32)         # (rb, 1)
    # exclusive prefix of row totals (rb rows; log2(rb) sublane rolls)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
    acc = totals
    s = 1
    while s < rb:
        acc = acc + jnp.where(iota_r >= s, pltpu.roll(acc, s, 0), 0.0)
        s *= 2
    offs = acc - totals                                           # exclusive
    return (part.astype(jnp.float32) + offs).reshape(1, width)


def _threefry_bits(k0, k1, c1):
    """threefry2x32 on (rows, 128) u32 counters with c0 = 0, XORed outputs
    -- jax.random's partitionable layout (element j draws
    xor(threefry2x32(key, (0, j)))), so in-kernel draws are BIT-EXACT to
    ops/rng's jax.random.uniform stream.  ~135 u32 VPU ops per call; used
    on the expected/fit path where it retires the externally-materialized
    uniform stream (and optionally in detect mode for strict counter-based
    reproducibility)."""
    ks2 = jnp.uint32(0x1BD11BDA) ^ k0 ^ k1
    ks = (k0, k1, ks2)
    x0 = jnp.zeros_like(c1) + k0
    x1 = c1 + k1
    R = ((13, 15, 26, 6), (17, 29, 16, 24))
    for i in range(5):
        for r in R[i % 2]:
            x0 = x0 + x1
            x1 = ((x1 << jnp.uint32(r))
                  | (x1 >> jnp.uint32(32 - r))) ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0 ^ x1


def _scatter_dir(cosa, sina, dx, dy, dz, u_azimuth):
    """ops/rotations.scatter_direction_by_angle, inlined (kernel-safe)."""
    b = 2.0 * jnp.pi * u_azimuth
    cosb = jnp.cos(b)
    sinb = jnp.sin(b)
    sinth = jnp.sqrt(jnp.maximum(1.0 - dz * dz, 0.0))
    safe_sinth = jnp.where(sinth > 0.0, sinth, 1.0)
    gx = dx * cosa - (dy * cosb + dz * dx * sinb) * sina / safe_sinth
    gy = dy * cosa + (dx * cosb - dz * dy * sinb) * sina / safe_sinth
    gz = dz * cosa + sina * sinb * sinth
    vx = sina * cosb
    vy = sina * sinb
    vz = cosa * jnp.sign(dz)
    vertical = sinth <= 0.0
    nx = jnp.where(vertical, vx, gx)
    ny = jnp.where(vertical, vy, gy)
    nz = jnp.where(vertical, vz, gz)
    inv_norm = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    return nx * inv_norm, ny * inv_norm, nz * inv_norm


def _interp_solve(u, x0, x1, b0, b1, acu0):
    """Inverse-CDF quadratic solve within a located segment (identical math
    to ops/samplers.sample_interpolated_dist / the reference's
    I3CLSimRandomValueInterpolatedDistribution.cxx:84-135)."""
    slope = (b1 - b0) / (x1 - x0)
    dy = u - acu0
    s_zero = jnp.abs(slope) < 1e-20
    b_zero = jnp.abs(b0) < 1e-20
    safe_slope = jnp.where(s_zero, 1.0, slope)
    safe_b = jnp.where(b_zero, 1.0, b0)
    r_full = x0 + (jnp.sqrt(jnp.maximum(
        dy * 2.0 * safe_slope / (safe_b * safe_b) + 1.0, 0.0)) - 1.0) \
        * safe_b / safe_slope
    r_bz = x0 + jnp.sqrt(jnp.maximum(2.0 * dy / safe_slope, 0.0))
    r_sz = x0 + dy / safe_b
    return jnp.where(b_zero & s_zero, x0,
                     jnp.where(b_zero, r_bz, jnp.where(s_zero, r_sz, r_full)))


def _make_kernel(spec: FusedSpec):
    """Build the kernel body for a static spec."""
    T = spec.iters_per_call
    K = spec.K
    W = K + 1           # directional walk band rows per feature
    BLK = spec.block_lanes
    RB = BLK // LANES
    Spad, Mpad = spec.Spad, spec.Mpad
    NBINS = spec.hist_n_bins
    QCAP = spec.queue_rows * LANES
    FMAX = spec.flush_rows * LANES
    ablate = frozenset(t for t in spec.ablate.split(",") if t)

    nsf = NSF + (NRSF if spec.records else 0)

    def kernel(*refs):
        if spec.records:
            qrec_out = refs[-1]
            refs = refs[:-1]
        else:
            qrec_out = None
        uni_ref = None
        tk_ref = None
        if spec.external_uniforms:
            (pf_ref, seed_ref, walk_ref, tilt_ref, acu_ref, co_ref,
             bias_ref, wtab_ref, sacu_ref, sco_ref, cell_ref, rel_ref,
             steps_ref, state_ref, uni_ref,
             state_out, qidx_out, qw_out, cnt_out) = refs
        elif spec.threefry:
            (pf_ref, seed_ref, walk_ref, tilt_ref, acu_ref, co_ref,
             bias_ref, wtab_ref, sacu_ref, sco_ref, cell_ref, rel_ref,
             steps_ref, state_ref, tk_ref,
             state_out, qidx_out, qw_out, cnt_out) = refs
        else:
            (pf_ref, seed_ref, walk_ref, tilt_ref, acu_ref, co_ref,
             bias_ref, wtab_ref, sacu_ref, sco_ref, cell_ref, rel_ref,
             steps_ref, state_ref,
             state_out, qidx_out, qw_out, cnt_out) = refs

        pf = lambda i: pf_ref[i]

        if not (spec.external_uniforms or spec.threefry):
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 1000003)
        if spec.threefry:
            # hoisted per-lane counters: element j of iteration i's (8, N)
            # draw has j = row*N + global_slot; only the (folded) key
            # changes per iteration
            N_total = spec.n_blocks * BLK
            rr_i = jax.lax.broadcasted_iota(jnp.int32, (8 * RB, LANES), 0)
            ln_i = jax.lax.broadcasted_iota(jnp.int32, (8 * RB, LANES), 1)
            tf_c1 = pltpu.bitcast(
                (rr_i // RB) * N_total + pl.program_id(0) * BLK
                + (rr_i % RB) * LANES + ln_i, jnp.uint32)

        qidx_out[:] = jnp.zeros_like(qidx_out[:])
        qw_out[:] = jnp.zeros_like(qw_out[:])
        if spec.records:
            qrec_out[:] = jnp.zeros_like(qrec_out[:])

        # ---- tables (VMEM-resident, bf16 split pairs precomputed) ----
        walk_splits = _split_bf16(walk_ref[:], spec.splits)   # (3Wp, Lpad)
        if not spec.affine_doms:
            rel_splits = _split_bf16(rel_ref[:], spec.splits)  # (4Mp+8, Spad)
        if spec.nz_tilt:
            tilt_splits = _split_bf16(tilt_ref[:], spec.splits)  # (2nd, nzp)
        acu_col = acu_ref[:]          # (rows, 4)
        co_splits = _split_bf16(co_ref[:], spec.splits)  # (5, nseg_pad)
        bias_splits = _split_bf16(bias_ref[:], spec.splits)  # (8, nbpad)
        if not spec.bias_uniform:
            # segment compare columns (x0, x1_cmp) -- transposed once
            bias_x0c = jnp.transpose(bias_ref[2:3, :], (1, 0))
            bias_x1c = jnp.transpose(bias_ref[4:5, :], (1, 0))
        # feature-major cell rows [sx sy maxr2 off | minz maxz z0 dzf nd |
        # sidx]; uniform-z affine mode needs only the first 4 blocks (its
        # z-pass test and z-grid come from scalar params), non-uniform
        # affine 9, the general path all 10 (fetch cost scales with rows)
        if spec.sub_plans:
            # per-subdetector table blocks: [sx sy maxr2 off] per group
            plan_splits = tuple(
                _split_bf16(cell_ref[p.row_off:p.row_off + 4 * p.K_cand,
                                     0:p.n_cells], spec.splits)
                for p in spec.sub_plans)
            plan_iotas = tuple(
                jax.lax.broadcasted_iota(jnp.int32, (p.n_cells, BLK), 0)
                for p in spec.sub_plans)
            cell_splits = None
        else:
            if spec.affine_doms:
                n_cell_feat = 4 if spec.uniform_z else 9
            else:
                n_cell_feat = 10
            cell_splits = _split_bf16(
                cell_ref[0:n_cell_feat * spec.K_cand, :], spec.splits)
        if spec.medium_tables:
            wtab_splits = _split_bf16(wtab_ref[:], spec.splits)  # (16, nwp)
            iota_wtab = jax.lax.broadcasted_iota(
                jnp.int32, (wtab_ref.shape[1], BLK), 0)
        if spec.scat_table:
            sacu_col = sacu_ref[:]                           # (nsp, 4)
            sco_splits = _split_bf16(sco_ref[:], spec.splits)  # (8, nsp)
        C = spec.K_cand

        if not spec.affine_doms:
            iota_S = jax.lax.broadcasted_iota(jnp.int32, (Spad, BLK), 0)
            iota_M = jax.lax.broadcasted_iota(jnp.int32, (Mpad, BLK), 0) \
                .astype(jnp.float32)
        iota_C = jax.lax.broadcasted_iota(jnp.int32, (C, BLK), 0)
        iota_cells = (None if spec.sub_plans else
                      jax.lax.broadcasted_iota(
                          jnp.int32, (cell_ref.shape[1], BLK), 0))
        iota_L = jax.lax.broadcasted_iota(jnp.int32, (spec.Lpad, BLK), 0)
        iota_bias = jax.lax.broadcasted_iota(
            jnp.int32, (bias_ref.shape[1], BLK), 0)

        def ld(ref, f):
            return ref[pl.ds(f * RB, RB), :]

        stp = {name: ld(steps_ref, f) for f, name in enumerate(STEP_FIELDS)}
        is_cherenkov = stp["source_type"] < 0.5

        nco = [pf(PF_N0 + i) for i in range(5)]
        gco = [pf(PF_G0 + i) for i in range(5)]

        def poly4(c, x):
            return c[0] + x * (c[1] + x * (c[2] + x * (c[3] + x * c[4])))

        flat = lambda a: a.reshape(1, BLK)
        tile = lambda a: a.reshape(RB, LANES)

        def sample_wavelength(uw_f, st_f):
            """Inverse-CDF sampling, flat (1, BLK) -> tiled.

            The CDF-segment one-hot is the difference of the monotone
            compare mask with its own shift (last true row == segment), and
            the 5 interpolation columns ride ONE bf16-split MXU fetch
            (inverse-CDF quadratic solve identical to the engine's
            ops/samplers path / I3CLSimRandomValueInterpolatedDistribution
            .cxx:84-135).  With stacked spectra (flashers), each table owns
            a contiguous row block and rows are masked by the lane's
            source_type -- the generateWavelength(sourceType) dispatch of
            propagation_kernel.c.cl:153-183 as one fused compare."""
            cmp = acu_col[:, 0:1] <= uw_f                    # (rows, BLK)
            nxt = acu_col[:, 1:2] <= uw_f                    # acu[k+1] <= u
            oh = cmp & ~nxt                                  # one-hot @ kseg
            if spec.n_tables > 1:
                oh = oh & (acu_col[:, 2:3] == st_f)
            ohf = oh.astype(jnp.bfloat16)
            cols = _fetch(co_splits, ohf, spec.splits)       # (5, BLK)
            args = [tile(cols[c:c + 1]) for c in range(5)]
            return _interp_solve(tile(uw_f), *args)

        def wavelength_bias(wl):
            """Bias interp; bf16-split MXU fetch, tiled.  Uniform grids use
            index math; non-uniform grids locate the segment with a dense
            compare (the acu pattern) -- same linear interpolation as the
            engine's jnp.interp with edge clamping."""
            if spec.bias_uniform:
                bxi = (wl - pf(PF_BIAS_X0)) * pf(PF_BIAS_INV_DX)
                bk = jnp.clip(jnp.floor(bxi), 0.0, float(spec.n_bias - 2))
                bfrac = jnp.clip(bxi - bk, 0.0, 1.0)
                mk = (iota_bias == flat(bk).astype(jnp.int32)) \
                    .astype(jnp.bfloat16)                    # (nbpad, BLK)
                fp = _fetch(bias_splits, mk, spec.splits)    # (8, BLK)
                f0 = tile(fp[0:1])
                f1 = tile(fp[1:2])
                return f0 + bfrac * (f1 - f0)
            wlc = jnp.clip(wl, pf(PF_BIAS_X0), pf(PF_BIAS_XMAX))
            fw = flat(wlc)
            oh = ((bias_x0c <= fw) & ~(bias_x1c <= fw)).astype(jnp.bfloat16)
            fp = _fetch(bias_splits, oh, spec.splits)        # (8, BLK)
            f0 = tile(fp[0:1])
            f1 = tile(fp[1:2])
            x0 = tile(fp[2:3])
            x1 = tile(fp[3:4])
            bfrac = jnp.clip((wlc - x0) / jnp.maximum(x1 - x0, 1e-9),
                             0.0, 1.0)
            return f0 + bfrac * (f1 - f0)

        def tilt_shift(x, y, z):
            """medium/tilt.tilt_z_shift, two-stage: one-hot over the z grid
            (the only large axis) fetches zc[d, kz] / zc[d, kz+1] for ALL
            nd distance columns at once; the small non-uniform distance
            bracket is then resolved with nd-2 selects.  (A/B-measured 1.5x
            faster than a three-stage grouped fetch: the sub-column selects
            cost more VPU than the nz-1-row compare build they replace.)"""
            if not spec.nz_tilt:
                return jnp.zeros_like(z)
            nz_cols = spec.nz_tilt - 1
            zr = (z - pf(PF_TILT_Z0)) * pf(PF_TILT_INV_DZ)
            kz = jnp.clip(jnp.floor(zr), 0.0, float(nz_cols - 1))
            fz_above = zr - kz
            fz_below = 1.0 - fz_above
            nr = pf(PF_TILT_CA) * x + pf(PF_TILT_SA) * y
            iota_tz = jax.lax.broadcasted_iota(
                jnp.int32, (tilt_splits.shape[1], BLK), 0)
            ohz = (iota_tz == flat(kz).astype(jnp.int32)) \
                .astype(jnp.bfloat16)
            rows = _fetch(tilt_splits, ohz, spec.splits)  # (2nd, BLK)
            rows = rows.reshape(rows.shape[0], RB, LANES)
            # distance bracket [j-1, j], j in [1, nd-1] (linear extrapolation
            # outside the grid, exactly like medium/tilt.py:52-68)
            j = jnp.ones_like(z)
            d_lo = jnp.full_like(z, pf(PF_TILT_D0))
            d_hi = jnp.full_like(z, pf(PF_TILT_D0 + 1))
            for jj in range(1, spec.nd_tilt - 1):
                m = nr >= pf(PF_TILT_D0 + jj)
                j = jnp.where(m, float(jj + 1), j)
                d_lo = jnp.where(m, pf(PF_TILT_D0 + jj), d_lo)
                d_hi = jnp.where(m, pf(PF_TILT_D0 + jj + 1), d_hi)
            q_ll, q_lh = rows[0], rows[1]
            q_hl, q_hh = rows[2], rows[3]
            for d in range(1, spec.nd_tilt - 1):
                m = j >= float(d + 1)
                q_ll = jnp.where(m, rows[2 * d], q_ll)
                q_lh = jnp.where(m, rows[2 * d + 1], q_lh)
                q_hl = jnp.where(m, rows[2 * d + 2], q_hl)
                q_hh = jnp.where(m, rows[2 * d + 3], q_hh)
            frac_lo = (d_hi - nr) / (d_hi - d_lo)
            frac_hi = 1.0 - frac_lo
            val_lo = q_lh * fz_above + q_ll * fz_below
            val_hi = q_hh * fz_above + q_hl * fz_below
            return val_hi * frac_hi + val_lo * frac_lo

        def flush(pend_idx, pend_w, head, n_dropped, rec=None):
            """Compact pending hits into the queue; returns cleared regs.
            `rec` (records mode): dict of NRQ per-lane f32 rows flushed to
            the record queue alongside (w, idx) through the same one-hot
            MXU compaction (saveHit's full record write,
            propagation_kernel.c.cl:307-404)."""
            fw = flat(pend_w)
            fi = flat(pend_idx)
            hit = fw != 0.0
            cs = _mask_scan_incl(hit, BLK)
            nh = jnp.max(cs)
            pos = jnp.where(hit, cs - 1.0, -1.0)
            headf = head.astype(jnp.float32)
            col0 = headf - jnp.floor(headf / LANES) * LANES
            row0 = (head // LANES).astype(jnp.int32)
            kept = jnp.minimum(jnp.minimum(nh, float(FMAX) - col0),
                               jnp.maximum(float(QCAP) - headf, 0.0))
            pos = jnp.where(pos < kept, pos, -1.0)

            @pl.when(nh > 0.0)
            def _():
                relpos = pos + col0                          # (1, BLK)
                iq = jax.lax.broadcasted_iota(jnp.int32, (LANES, BLK), 0)
                # queue values ride the MXU instead of a cross-lane VPU
                # reduction: each one-hot row selects EXACTLY ONE lane, so a
                # bf16 matmul with exact-in-bf16 summands reconstructs w and
                # idx losslessly (w as a hi+lo split, idx base-128 digits;
                # every per-row product/sum is a single bf16-representable
                # value, so the bf16-rounded MXU output is exact)
                w_hi = fw.astype(jnp.bfloat16)
                w_lo = (fw - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)

                def digits3(v):
                    d_hi = jnp.floor(v * (1.0 / 16384.0))
                    rem_ = v - d_hi * 16384.0
                    d_mid = jnp.floor(rem_ * (1.0 / 128.0))
                    d_lo = rem_ - d_mid * 128.0
                    return [d_hi.astype(jnp.bfloat16),
                            d_mid.astype(jnp.bfloat16),
                            d_lo.astype(jnp.bfloat16)]

                def split_rows(v):
                    v_hi = v.astype(jnp.bfloat16)
                    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    return [v_hi, v_lo]

                rows = [w_hi, w_lo] + digits3(fi)
                if rec is not None:
                    # float fields as exact-per-row hi/lo splits; the integer
                    # fields (identifier, num_scatters) as base-128 digits
                    for name in REC_QUEUE_FIELDS:
                        v = flat(rec[name])
                        if name in ("identifier", "num_scatters"):
                            rows += digits3(v)
                        else:
                            rows += split_rows(v)
                n_rows = len(rows)
                n_pad = (-n_rows) % 8
                vals = jnp.concatenate(
                    rows + [jnp.zeros((n_pad, BLK), jnp.bfloat16)],
                    axis=0)                       # (n_rows+pad, BLK)
                for f in range(spec.flush_rows):
                    ohf = ((iq == flat(relpos - f * LANES).astype(jnp.int32))
                           & (pos >= 0.0)).astype(jnp.bfloat16)
                    cols = jax.lax.dot_general(
                        ohf, vals, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # (128, nrows)
                    rw = cols[:, 0:1] + cols[:, 1:2]
                    ri = cols[:, 2:3] * 16384.0 + cols[:, 3:4] * 128.0 \
                        + cols[:, 4:5]
                    packed = jnp.concatenate([rw, ri], axis=1)   # (128, 2)
                    rows2 = jnp.transpose(packed, (1, 0))        # (2, 128)
                    rr = jnp.minimum(row0 + f, spec.queue_rows - 1)
                    if rec is not None:
                        rcols = []
                        c = 5
                        for name in REC_QUEUE_FIELDS:
                            if name in ("identifier", "num_scatters"):
                                rcols.append(cols[:, c:c + 1] * 16384.0
                                             + cols[:, c + 1:c + 2] * 128.0
                                             + cols[:, c + 2:c + 3])
                                c += 3
                            else:
                                rcols.append(cols[:, c:c + 1]
                                             + cols[:, c + 1:c + 2])
                                c += 2
                        rrows = jnp.transpose(
                            jnp.concatenate(rcols, axis=1), (1, 0))  # (NRQ,128)

                    @pl.when(row0 + f < spec.queue_rows)
                    def _():
                        qw_out[pl.ds(rr, 1), :] = \
                            qw_out[pl.ds(rr, 1), :] + rows2[0:1]
                        qidx_out[pl.ds(rr, 1), :] = \
                            qidx_out[pl.ds(rr, 1), :] + rows2[1:2]
                        if rec is not None:
                            qrec_out[pl.ds(rr * NRQ, NRQ), :] = \
                                qrec_out[pl.ds(rr * NRQ, NRQ), :] + rrows

            head = head + kept.astype(jnp.int32)
            n_dropped = n_dropped + (nh - kept)
            zero = jnp.zeros_like(pend_w)
            return zero, zero, head, n_dropped

        def body(i, carry, spawn_now, u_pre=None):
            """One propagation iteration; `spawn_now` is STATIC -- the spawn
            phase is scheduled by the loop structure (every spawn_every-th
            iteration), so non-spawn iterations draw only the 4 uniform rows
            the budget/scatter phases need and trace no spawn code.
            `u_pre` carries group-hoisted uniforms (one PRNG draw per
            spawn group instead of per iteration: the draw+convert leaves
            the per-iteration critical path)."""
            (photons_left, in_flight, x, y, z, t, dx, dy, dz, w0, inv_gv,
             abs_left, gsv, pav, qav, rav, pend_idx, pend_w) = carry[:NSF]
            rv = (dict(zip(REC_STATE_FIELDS, carry[NSF:nsf]))
                  if spec.records else None)
            (head, n_gen, n_hits, w_sum, n_dropped, n_work) = carry[nsf:]

            if u_pre is not None:
                # group-hoisted RAW bits (uint32; half the VMEM of holding
                # converted floats): convert this iteration's slice here
                def conv(rows):
                    if rows is None:
                        return None
                    b = pltpu.bitcast(rows, jnp.uint32) >> jnp.uint32(8)
                    return pltpu.bitcast(b, jnp.int32).astype(jnp.float32) \
                        * (2.0 ** -24)
                u = [conv(r) for r in u_pre]
            elif spec.external_uniforms:
                uu = uni_ref[pl.ds(i * 8 * RB, 8 * RB), :]
                u = [uu[c * RB:(c + 1) * RB, :] for c in range(8)]
            elif spec.threefry:
                # bit-exact ops/rng draw: rows r0..r0+nrows of iteration
                # i's (8, N) element grid, keyed by the folded per-
                # iteration key (host-precomputed, SMEM)
                nrows = 8 if spawn_now else 4
                r0 = 0 if spawn_now else 4
                # scalar s32 -> u32 convert wraps mod 2^32 (bit-preserving)
                k0 = tk_ref[2 * i].astype(jnp.uint32)
                k1 = tk_ref[2 * i + 1].astype(jnp.uint32)
                bits = _threefry_bits(k0, k1,
                                      tf_c1[r0 * RB:(r0 + nrows) * RB])
                fb = pltpu.bitcast((bits >> jnp.uint32(9))
                                   | jnp.uint32(0x3F800000),
                                   jnp.float32) - 1.0
                rows = [fb[c * RB:(c + 1) * RB] for c in range(nrows)]
                u = rows if spawn_now else [None] * 4 + rows
            elif "norng" in ablate:
                uu = jnp.full((8 * RB, LANES), 0.5, jnp.float32)
                u = [uu[c * RB:(c + 1) * RB, :] for c in range(8)]
            else:
                nrows = 8 if spawn_now else 4
                bits = pltpu.prng_random_bits((nrows * RB, LANES))
                bits = pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(8)
                uu = pltpu.bitcast(bits, jnp.int32).astype(jnp.float32) \
                    * (2.0 ** -24)
                rows = [uu[c * RB:(c + 1) * RB, :] for c in range(nrows)]
                u = rows if spawn_now else [None] * 4 + rows

            # ---------- spawn (createPhotonFromTrack, kernel:132-184) -----
            # All wavelength-derived per-photon constants (group slowness,
            # walk coefficients gs/pa/qa/ra, bias weight w0) are computed
            # here once; the iteration body never touches the spectrum/bias
            # tables or pow/exp again for this photon.
            def do_spawn(sp):
                (photons_left, in_flight, x, y, z, t, dx, dy, dz, w0,
                 inv_gv, abs_left, gsv, pav, qav, rav, n_gen) = sp
                fresh = (in_flight < 0.5) & (photons_left > 0.5) \
                    & (pend_w == 0.0)
                shift = stp["length"] * u[0]
                px = stp["x"] + stp["dir_x"] * shift
                py = stp["y"] + stp["dir_y"] * shift
                pz = stp["z"] + stp["dir_z"] * shift
                pt = stp["t"] + shift / (C_LIGHT * stp["beta"])

                if "nospawn" in ablate:
                    new_wlen = jnp.full_like(x, 400.0)
                else:
                    new_wlen = sample_wavelength(flat(u[1]),
                                                 flat(stp["source_type"]))
                if spec.medium_tables:
                    # water / photonics media: separable wavelength factors
                    # (and optionally n_phase/n_group) from uniform-grid
                    # tables, one bf16-split MXU fetch for all rows
                    # (medium/properties.py:119-152)
                    wxi = (flat(new_wlen) - pf(PF_WTAB_X0)) \
                        * pf(PF_WTAB_INV_DX)
                    wk = jnp.clip(jnp.floor(wxi), 0.0,
                                  float(spec.n_wtab - 2))
                    wfr = tile(jnp.clip(wxi - wk, 0.0, 1.0))
                    mw = (iota_wtab == wk.astype(jnp.int32)) \
                        .astype(jnp.bfloat16)
                    wrows = _fetch(wtab_splits, mw, spec.splits)  # (16, BLK)
                    lerp = lambda r: (tile(wrows[r:r + 1])
                                      + wfr * (tile(wrows[r + 1:r + 2])
                                               - tile(wrows[r:r + 1])))
                    n_gs = lerp(0)
                    n_pa = lerp(2)
                    n_qa = lerp(4)
                    n_ra = lerp(6)
                    if spec.ref_table:
                        n_phase = lerp(8)
                        n_group = lerp(10)
                    else:
                        wl_um = new_wlen * 1e-3
                        n_phase = poly4(nco, wl_um)
                        n_group = n_phase * poly4(gco, wl_um)
                else:
                    wl_um = new_wlen * 1e-3
                    n_phase = poly4(nco, wl_um)
                    n_group = n_phase * poly4(gco, wl_um)
                    # per-photon optical coefficients (engine
                    # medium.scat_coeff / abs_coeffs;
                    # AbsLenIceCube.cxx:63-67, ScatLenIceCube.cxx:53)
                    n_gs = (new_wlen / 400.0) ** (-pf(PF_ALPHA))
                    xkap = new_wlen ** (-pf(PF_KAPPA))
                    ebx = pf(PF_ABS_A) * jnp.exp(-pf(PF_ABS_B) / new_wlen)
                    n_pa = pf(PF_ABS_D) * xkap
                    n_qa = pf(PF_ABS_E) * xkap + ebx
                    n_ra = 0.01 * ebx
                cos_c = jnp.minimum(1.0, 1.0 / (stp["beta"] * n_phase))
                sin_c = jnp.sqrt(jnp.maximum(1.0 - cos_c * cos_c, 0.0))
                cdx, cdy, cdz = _scatter_dir(cos_c, sin_c, stp["dir_x"],
                                             stp["dir_y"], stp["dir_z"],
                                             u[2])
                ndx = jnp.where(is_cherenkov, cdx, stp["dir_x"])
                ndy = jnp.where(is_cherenkov, cdy, stp["dir_y"])
                ndz = jnp.where(is_cherenkov, cdz, stp["dir_z"])
                if spec.expected or spec.fixed_abs:
                    # fixed absorption-length horizon (engine.py:171-176)
                    abs_init = jnp.full_like(x, spec.horizon)
                else:
                    abs_init = -jnp.log(1.0 - u[3])
                # saveHit weight contract (propagation_kernel.c.cl:370):
                # weight = step.weight / bias(lambda), precomputed per photon
                if "nobias" in ablate:
                    n_w0 = stp["weight"]
                else:
                    n_w0 = stp["weight"] / jnp.maximum(
                        wavelength_bias(new_wlen), 1e-20)

                sel = lambda new, old: jnp.where(fresh, new, old)
                x = sel(px, x); y = sel(py, y); z = sel(pz, z)
                t = sel(pt, t)
                dx = sel(ndx, dx); dy = sel(ndy, dy); dz = sel(ndz, dz)
                w0 = sel(n_w0, w0)
                inv_gv = sel(n_group / C_LIGHT, inv_gv)
                abs_left = sel(abs_init, abs_left)
                if spec.records:
                    # spawn-time record state (I3Photon start fields)
                    rv["wlen"] = sel(new_wlen, rv["wlen"])
                    rv["start_x"] = sel(px, rv["start_x"])
                    rv["start_y"] = sel(py, rv["start_y"])
                    rv["start_z"] = sel(pz, rv["start_z"])
                    rv["start_t"] = sel(pt, rv["start_t"])
                    rv["sdx"] = sel(ndx, rv["sdx"])
                    rv["sdy"] = sel(ndy, rv["sdy"])
                    rv["sdz"] = sel(ndz, rv["sdz"])
                    rv["n_scat"] = sel(jnp.zeros_like(x), rv["n_scat"])
                    rv["abs_init"] = sel(abs_init, rv["abs_init"])
                gsv = sel(n_gs, gsv); pav = sel(n_pa, pav)
                qav = sel(n_qa, qav); rav = sel(n_ra, rav)
                freshf = fresh.astype(jnp.float32)
                in_flight = jnp.maximum(in_flight, freshf)
                photons_left = photons_left - freshf
                # per-lane accumulator: scalar tree-reductions
                # per iteration are ~10x an elementwise add;
                # reduced once in the epilogue
                n_gen = n_gen + freshf
                return (photons_left, in_flight, x, y, z, t, dx, dy, dz,
                        w0, inv_gv, abs_left, gsv, pav, qav, rav, n_gen)

            sp = (photons_left, in_flight, x, y, z, t, dx, dy, dz, w0,
                  inv_gv, abs_left, gsv, pav, qav, rav, n_gen)
            if spawn_now:
                sp = do_spawn(sp)
            (photons_left, in_flight, x, y, z, t, dx, dy, dz, w0, inv_gv,
             abs_left, gsv, pav, qav, rav, n_gen) = sp
            active = in_flight > 0.5

            # ---------- budgets + anisotropy (kernel:615-694) -------------
            if spec.aniso:
                ca, sa = pf(PF_AN_CA), pf(PF_AN_SA)
                k1, k2, kz = pf(PF_AN_K1), pf(PF_AN_K2), pf(PF_AN_KZ)
                l1, l2, l3 = k1 * k1, k2 * k2, kz * kz
                B2 = 1.0 / l1 + 1.0 / l2 + 1.0 / l3
                n1 = ca * dx + sa * dy
                n2 = -sa * dx + ca * dy
                s1, s2, s3 = n1 * n1, n2 * n2, dz * dz
                nB = s1 / l1 + s2 / l2 + s3 / l3
                An = s1 * l1 + s2 * l2 + s3 * l3
                abs_corr = 2.0 / ((B2 - nB) * An)
            else:
                abs_corr = jnp.ones_like(dx)
            sca_budget = -jnp.log(1.0 - u[4])
            abs_budget = abs_left * abs_corr
            if "nobudget" in ablate:   # static: aniso/budget math dead
                abs_corr = jnp.ones_like(dx)
                sca_budget = jnp.full_like(dx, 0.7)
                abs_budget = abs_left

            # ---------- collision prelude (d_prop-independent) -------------
            # The cell-grid fetch and 2-D ray geometry depend only on the
            # segment START (x, y, dx, dy) -- issuing them BEFORE the
            # tilt/walk MXU chain gives the scheduler independent work to
            # overlap with it (the iteration is latency-bound: ablations
            # show superadditive savings, i.e. a mostly-serial schedule).
            dir_xy2 = dx * dx + dy * dy
            has_xy = dir_xy2 > 0.0
            inv_dir_xy2 = 1.0 / jnp.maximum(dir_xy2, 1e-20)
            R2 = pf(PF_R2)
            Rcol = jnp.sqrt(R2)
            pancake = pf(PF_PANCAKE)
            max_seg = pf(PF_MAX_SEG)

            fx_, fy_, fz_ = flat(x), flat(y), flat(z)
            fdx, fdy, fdz = flat(dx), flat(dy), flat(dz)
            fact = flat((active & has_xy).astype(jnp.float32)) > 0.5
            finv = flat(inv_dir_xy2)

            if not spec.sub_plans:
                cxi = jnp.clip(jnp.floor((x - spec.cell_x0) * spec.inv_cell),
                               0.0, float(spec.cell_nx - 1))
                cyi = jnp.clip(jnp.floor((y - spec.cell_y0) * spec.inv_cell),
                               0.0, float(spec.cell_ny - 1))
                cell = cxi * float(spec.cell_ny) + cyi

                ohc = (iota_cells == flat(cell).astype(jnp.int32)) \
                    .astype(jnp.bfloat16)                    # (NCp, BLK)
                cf = _fetch(cell_splits, ohc, spec.splits)   # (n_feat*C, BLK)
                sxc = cf[0 * C:1 * C]
                syc = cf[1 * C:2 * C]
                maxr2c = cf[2 * C:3 * C]
                offc = cf[3 * C:4 * C]
                if not (spec.affine_doms and spec.uniform_z):
                    minzc = cf[4 * C:5 * C]
                    maxzc = cf[5 * C:6 * C]
                    z0c = cf[6 * C:7 * C]
                    dzc = cf[7 * C:8 * C]
                    ndc = cf[8 * C:9 * C]
                if not spec.affine_doms:
                    sic = cf[9 * C:10 * C]

                rx = sxc - fx_                               # (C, BLK)
                ry = syc - fy_
                bd2 = rx * fdx + ry * fdy
                A2c = rx * rx + ry * ry
                if spec.affine_doms and spec.uniform_z:
                    # every string shares the z-extent: one (1, BLK) test
                    # from the scalar z-grid broadcasts over candidates
                    uz_z1 = pf(PF_UZ_Z0) + pf(PF_UZ_DZ) * (pf(PF_UZ_ND)
                                                           - 1.0)
                    uz_lo = jnp.minimum(pf(PF_UZ_Z0), uz_z1)
                    uz_hi = jnp.maximum(pf(PF_UZ_Z0), uz_z1)
                    pass_z = ~((fdz > 0) & (fz_ > uz_hi + Rcol)) \
                        & ~((fdz < 0) & (fz_ < uz_lo - Rcol))
                else:
                    pass_z = ~((fdz > 0) & (fz_ > maxzc + Rcol)) \
                        & ~((fdz < 0) & (fz_ < minzc - Rcol))
                # rank with the STATIC segment cap instead of this segment's
                # d_prop: candidates beyond d_prop are rejected by the
                # sphere test's distance gate anyway, and the constant cap
                # removes the walk -> cull serial dependency.  Same
                # approximation class: top-K closest culled strings (the
                # reference tests every culled string,
                # sparse_collision_kernel.c.cl:462-587).
                t2d = jnp.clip(bd2 * finv, 0.0, max_seg)
                cx = rx - fdx * t2d
                cy = ry - fdy * t2d
                dist2 = cx * cx + cy * cy
                pass_r = dist2 <= maxr2c
                cand = pass_r & pass_z & fact
                ranked = jnp.where(cand, dist2, BIG)
                if "cullfetchonly" in ablate:
                    # probe (with nosphere): cell fetch stays live, the
                    # per-candidate cull math above becomes dead code
                    ranked = jnp.where(cf[0:C] > BIG, 0.0, BIG)

            # ---------- tilt + layer walk (kernel:598-696) -----------------
            shift_z = (jnp.zeros_like(z) if "notilt" in ablate
                       else tilt_shift(x, y, z))
            z_eff = z - shift_z
            hL = pf(PF_LAYER_H)
            j0f = jnp.floor((z_eff - pf(PF_Z_START)) / hL)
            j0 = jnp.clip(j0f, 0.0, float(spec.L - 1))

            going_up = dz >= 0.0
            # directional band: column j0+K holds layers j0..j0+K (up),
            # column j0 holds layers j0-K..j0 (down; reversed to visit
            # order by the static row reindex below) -- half the fetched
            # rows of the old symmetric 2K+1 window
            # (bool reshapes don't lower on Mosaic -- fold the direction
            # offset in f32 before flattening)
            oh_col = flat(j0 + jnp.where(going_up, float(K), 0.0)) \
                .astype(jnp.int32)
            oh_w = (iota_L == oh_col).astype(jnp.bfloat16)
            win = _fetch(walk_splits, oh_w, spec.splits)     # (3Wp, BLK)
            win3 = win.reshape(win.shape[0], RB, LANES)
            if "nowalkfetch" in ablate:  # probe: one-hot+fetch become dead
                win3 = jnp.full_like(win3, 0.05)

            # per-photon optical coefficients were computed at spawn
            gs, pa, qa, ra = gsv, pav, qav, rav

            abs_dz = jnp.abs(dz)
            vertical = abs_dz < EPSILON
            boundary_z = pf(PF_Z_START) + j0 * hL \
                + jnp.where(going_up, hL, 0.0)
            safe_dz = jnp.where(vertical, 1.0, dz)
            t_bound0 = jnp.where(vertical, BIG, (boundary_z - z_eff) / safe_dz)
            t_bound0 = jnp.where(t_bound0 < 0.0, BIG, t_bound0)
            t_step = jnp.where(vertical, BIG, hL / jnp.maximum(abs_dz, 1e-20))

            # ---- stacked prefix-sum walk: identical semantics to the old
            # sequential K+1-step loop (including the post-loop closure with
            # the outermost window column -- algebraically the forced last
            # row below), but as ~30 WIDE ops on (K+1)*RB-row stacks instead
            # of ~90 narrow serially-dependent ops.  Mosaic issues strictly
            # in order with no cross-chain overlap (probe_pallas5), so op
            # count/width IS the cost model.
            Kp1 = K + 1
            st2 = lambda a3: a3.reshape(Kp1 * RB, LANES)
            rep = lambda v: jnp.concatenate([v] * Kp1, axis=0)
            up_m = rep(going_up)

            def rev_rows(lo):
                # static reversed-slice concat (jnp.flip's `rev` primitive
                # has no Pallas TPU lowering)
                return jnp.concatenate(
                    [win3[lo + K - k:lo + K - k + 1] for k in range(Kp1)],
                    axis=0)

            b_dir = jnp.where(up_m, st2(win3[0:K + 1]),
                              st2(rev_rows(0)))
            a_dir = jnp.where(up_m, st2(win3[W:W + K + 1]),
                              st2(rev_rows(W)))
            dt_dir = jnp.where(up_m, st2(win3[2 * W:2 * W + K + 1]),
                               st2(rev_rows(2 * W)))
            inv_s_all = rep(gs) * b_dir
            inv_a_all = rep(pa) * a_dir + rep(qa) + rep(ra) * dt_dir
            kconst = jnp.concatenate(
                [jnp.full((RB, LANES), float(k), jnp.float32)
                 for k in range(Kp1)], axis=0)
            tb0_r = rep(t_bound0)
            tst_r = rep(t_step)
            t_prev = jnp.where(kconst == 0.0, 0.0,
                               tb0_r + (kconst - 1.0) * tst_r)
            t_k = tb0_r + kconst * tst_r
            li = jnp.where(kconst == 0.0, tb0_r, tst_r)
            # exclusive prefix sums of the per-layer optical depths
            cs3 = (li * inv_s_all).reshape(Kp1, RB, LANES)
            ca3 = (li * inv_a_all).reshape(Kp1, RB, LANES)
            accs = jnp.zeros((RB, LANES), jnp.float32)
            acca = jnp.zeros((RB, LANES), jnp.float32)
            CS_list, CA_list = [accs], [acca]
            for k in range(1, Kp1):
                accs = accs + cs3[k - 1]
                acca = acca + ca3[k - 1]
                CS_list.append(accs)
                CA_list.append(acca)
            tau_s_all = rep(sca_budget) - jnp.concatenate(CS_list, axis=0)
            tau_a_all = rep(abs_budget) - jnp.concatenate(CA_list, axis=0)
            # division-free exhaustion test: t_k >= t_prev + tau/inv
            # <=> (t_k - t_prev)*inv >= tau (inv > 0 by table padding) --
            # a wide f32 division costs ~7x a multiply on the VPU and this
            # stack is the kernel's widest, so the division happens ONCE on
            # the narrow picked winner below instead of per candidate row
            dt_k = t_k - t_prev
            cur_j = rep(j0) + kconst * rep(jnp.where(going_up, 1.0, -1.0))
            at_edge = (up_m & (cur_j >= spec.L - 1)) \
                | ((~up_m) & (cur_j <= 0))
            cond = (dt_k * inv_s_all >= tau_s_all) \
                | (dt_k * inv_a_all >= tau_a_all) | at_edge \
                | (t_k >= max_seg) | (kconst >= float(K))
            c3 = cond.reshape(Kp1, RB, LANES)
            seen = jnp.zeros((RB, LANES), bool)
            firsts = []
            for k in range(Kp1):
                firsts.append((c3[k] & ~seen).astype(jnp.float32))
                seen = seen | c3[k]
            first = jnp.concatenate(firsts, axis=0)

            def pick_k(stack):
                return jnp.sum((first * stack).reshape(Kp1, RB, LANES),
                               axis=0)
            tau_s_w = pick_k(tau_s_all)
            inv_s_w = pick_k(inv_s_all)
            inv_a_fin = pick_k(inv_a_all)
            tau_a = pick_k(tau_a_all)
            t_done = pick_k(t_prev)
            d_scat = t_done + tau_s_w / inv_s_w
            d_abs = t_done + tau_a / inv_a_fin
            if "nowalk" in ablate:   # static: the walk above becomes dead code
                d_scat = sca_budget * 25.0
                d_abs = abs_budget * 25.0
                t_done = jnp.zeros_like(x)
                tau_a = abs_budget
                inv_a_fin = jnp.full_like(x, 1.0 / 25.0)
            if "walkfetchonly" in ablate:  # probe: stacked walk math dead,
                d_scat = sca_budget * 25.0 + win3[0] * 1e-20  # fetch live
                d_abs = abs_budget * 25.0
                t_done = jnp.zeros_like(x)
                tau_a = abs_budget
                inv_a_fin = jnp.full_like(x, 1.0 / 25.0)

            absorbed = d_abs < d_scat
            d_prop = jnp.minimum(jnp.minimum(d_scat, d_abs), max_seg)
            capped = (~absorbed & (d_scat > max_seg)) | \
                     (absorbed & (d_abs > max_seg))
            absorbed = absorbed & ~capped
            scattered = (~absorbed) & (~capped)
            # remaining corrected budget after d_prop (engine.py:279-281)
            abs_left_corr = jnp.maximum(tau_a - (d_prop - t_done) * inv_a_fin,
                                        0.0)
            abs_left_corr = jnp.where(absorbed, 0.0, abs_left_corr)

            # ---------- collision (sparse_collision_kernel.c.cl) ----------
            # 2-D cell-grid cull (the TPU form of the reference's
            # per-subdetector cell grid, _InCells :305-460): the lane's cell
            # index selected a precomputed <= K_cand candidate-string feature
            # block in the prelude above; only the segment-length clip and
            # the ranking remain d_prop-dependent.
            fdp = flat(d_prop)

            n_string_rounds = (0 if ("nosphere" in ablate or
                                     "nocull" in ablate)
                               else spec.n_string_rounds)
            inv_pancake = 1.0 / pancake

            def pick(rows, mf):
                """Winner-candidate feature: sum over <= K_cand rows."""
                return tile(jnp.sum(mf * rows, axis=0, keepdims=True))

            if spec.sub_plans:
                # ---- per-subdetector collision (the reference's DO_CHECK
                # sequence over per-stringset grids, sparse_collision_kernel
                # .c.cl:305-460): each string group runs its own cell cull,
                # top-rounds peel and z-window candidate test with ITS OWN
                # dz granularity and a statically-proven round count; the
                # global minimum entry distance merges the groups.  A dense
                # infill no longer sets the candidate counts detector-wide.
                margin = Rcol + 1.0
                inv_pk = 1.0 / pancake
                best_all = d_prop
                dom_all = jnp.zeros_like(x)
                ctr_x = jnp.zeros_like(x)
                ctr_y = jnp.zeros_like(x)
                ctr_z = jnp.zeros_like(x)
                stackr = lambda it: jnp.concatenate(list(it), axis=0)
                for pi, sp in enumerate(spec.sub_plans):
                    C_ = sp.K_cand
                    cxi = jnp.clip(jnp.floor((x - sp.x0) * sp.inv_cell),
                                   0.0, float(sp.nx - 1))
                    cyi = jnp.clip(jnp.floor((y - sp.y0) * sp.inv_cell),
                                   0.0, float(sp.ny - 1))
                    cellv = cxi * float(sp.ny) + cyi
                    ohc = (plan_iotas[pi] == flat(cellv).astype(jnp.int32)) \
                        .astype(jnp.bfloat16)
                    cf_p = _fetch(plan_splits[pi], ohc, spec.splits)
                    sxc_p = cf_p[0:C_]
                    syc_p = cf_p[C_:2 * C_]
                    maxr2_p = cf_p[2 * C_:3 * C_]
                    off_p = cf_p[3 * C_:4 * C_]
                    rxp = sxc_p - fx_
                    ryp = syc_p - fy_
                    bd2_p = rxp * fdx + ryp * fdy
                    A2_p = rxp * rxp + ryp * ryp
                    pz = ~((fdz > 0) & (fz_ > sp.maxz + Rcol)) \
                        & ~((fdz < 0) & (fz_ < sp.minz - Rcol))
                    t2d = jnp.clip(bd2_p * finv, 0.0, max_seg)
                    cxp_ = rxp - fdx * t2d
                    cyp_ = ryp - fdy * t2d
                    d2p = cxp_ * cxp_ + cyp_ * cyp_
                    rankedp = jnp.where((d2p <= maxr2_p) & pz & fact,
                                        d2p, BIG)
                    iota_Cp = jax.lax.broadcasted_iota(jnp.int32, (C_, BLK),
                                                       0)
                    peel = []
                    for _k in range(sp.rounds):
                        mi, sidx = _min_and_idx(rankedp, iota_Cp)
                        mask = (iota_Cp == sidx)
                        rankedp = jnp.where(mask, BIG, rankedp)
                        peel.append((mask.astype(jnp.float32), mi))
                    NR, NC = sp.rounds, sp.n_dom_cand
                    repr_ = (lambda v: jnp.concatenate([v] * NR, axis=0)) \
                        if NR > 1 else (lambda v: v)

                    def repc(v, NC=NC):
                        return jnp.concatenate([v] * NC, axis=0)

                    A2_s = stackr(pick(A2_p, mf) for mf, mi in peel)
                    Bd_s = stackr(pick(bd2_p, mf) for mf, mi in peel)
                    foff_s = stackr(pick(off_p, mf) for mf, mi in peel)
                    sok_s = stackr(tile(jnp.where(mi < BIG, 1.0, 0.0))
                                   for mf, mi in peel) > 0.5
                    z_s = repr_(z)
                    dz_s = repr_(dz)
                    dp_s = repr_(d_prop)
                    inv_dzf = 1.0 / sp.uz_dz        # static python float
                    m1 = (z_s - sp.uz_z0) * inv_dzf
                    m2 = m1 + dz_s * (dp_s * inv_dzf)
                    mlo = -jnp.floor(-(jnp.minimum(m1, m2)
                                       - margin * abs(inv_dzf)))
                    m_sc = jnp.clip(
                        jnp.concatenate([mlo + float(c) for c in range(NC)],
                                        axis=0), 0.0, sp.uz_nd - 1.0)
                    z_c = repc(z_s)
                    dz_c = repc(dz_s)
                    dp_c = repc(dp_s)
                    oz = sp.uz_z0 + sp.uz_dz * m_sc - z_c
                    urdot = repc(Bd_s) + oz * dz_c
                    dr2 = repc(A2_s) + oz * oz
                    discr = urdot * urdot - dr2 + R2
                    sq = jnp.sqrt(jnp.maximum(discr, 0.0)) * inv_pk
                    smin1 = urdot - sq
                    good = repc(sok_s) & (discr >= 0.0) \
                        & (smin1 >= 0.0) & (smin1 < dp_c)
                    sm3 = jnp.where(good, smin1, BIG) \
                        .reshape(NR * NC, RB, LANES)
                    dom3 = (repc(foff_s) + m_sc).reshape(NR * NC, RB, LANES)
                    best_p = jnp.min(sm3, axis=0)
                    onwin = sm3 == best_p[None]
                    dom_p = jnp.max(jnp.where(onwin, dom3, -1.0), axis=0)
                    m_new = best_p < best_all
                    dom_all = jnp.where(m_new, dom_p, dom_all)
                    if spec.records:
                        sxs = repc(stackr(pick(sxc_p, mf)
                                          for mf, mi in peel)) \
                            .reshape(NR * NC, RB, LANES)
                        sys_ = repc(stackr(pick(syc_p, mf)
                                           for mf, mi in peel)) \
                            .reshape(NR * NC, RB, LANES)
                        zd3 = (sp.uz_z0 + sp.uz_dz * m_sc) \
                            .reshape(NR * NC, RB, LANES)
                        pickw = lambda v3: jnp.max(
                            jnp.where(onwin, v3, -BIG), axis=0)
                        ctr_x = jnp.where(m_new, pickw(sxs), ctr_x)
                        ctr_y = jnp.where(m_new, pickw(sys_), ctr_y)
                        ctr_z = jnp.where(m_new, pickw(zd3), ctr_z)
                    best_all = jnp.minimum(best_p, best_all)
                hit = best_all < d_prop
                hit_dist = jnp.where(hit, best_all, d_prop)
                hit_dom = jnp.where(hit, dom_all, 0.0)
            elif spec.affine_doms:
                # ---- analytic candidate-DOM test (z-layer windowing): every
                # DOM sits exactly at z0 + m*dz on a vertical string, so the
                # <= n_dom_cand indices overlapping the segment's z-span are
                # computed per lane (the TPU form of
                # sparse_collision_kernel.c.cl:27-192's geoLayerToOMNumIndex
                # window); all per-string features come from the cell fetch.
                margin = Rcol + 1.0
                # peel the top-K string masks first (cheap serial VPU), then
                # run every round's pick + candidate-DOM chain INDEPENDENTLY
                # (each against the constant d_prop incumbent) and merge by
                # minimum entry distance -- the closest tested DOM wins
                # either way, at half the serial MXU/VPU depth of the old
                # round-coupled form
                peel = []
                for _k in range(n_string_rounds):
                    mi, sidx = _min_and_idx(ranked, iota_C)
                    mask = (iota_C == sidx)
                    ranked = jnp.where(mask, BIG, ranked)
                    peel.append((mask.astype(jnp.float32), mi))
                # fully STACKED sphere test: all rounds x candidates as one
                # set of wide ops on (NR*NC*RB, LANES) arrays (in-order
                # issue makes op count the cost; the old per-round
                # per-candidate loops were ~6x the ops at 1/10 the width).
                # The global minimum entry distance decides the hit --
                # identical accept set to the sequential form (exact-tie dom
                # choice differs on a measure-zero set).
                ctr_x = jnp.zeros_like(x)
                ctr_y = jnp.zeros_like(x)
                ctr_z = jnp.zeros_like(x)
                if n_string_rounds == 0:
                    hit = jnp.zeros_like(x, bool)
                    hit_dist = d_prop
                    hit_dom = jnp.zeros_like(x)
                else:
                    NR = n_string_rounds
                    NC = spec.n_dom_cand
                    stackr = lambda it: jnp.concatenate(list(it), axis=0)
                    repr_ = lambda v: jnp.concatenate([v] * NR, axis=0)

                    def repc(v):
                        if jnp.ndim(v) == 0:
                            return v
                        return jnp.concatenate([v] * NC, axis=0)

                    A2_s = stackr(pick(A2c, mf) for mf, mi in peel)
                    Bd_s = stackr(pick(bd2, mf) for mf, mi in peel)
                    foff_s = stackr(pick(offc, mf) for mf, mi in peel)
                    sok_s = stackr(tile(jnp.where(mi < BIG, 1.0, 0.0))
                                   for mf, mi in peel) > 0.5
                    if spec.uniform_z:
                        fz0_s = pf(PF_UZ_Z0)
                        fdzf_s = pf(PF_UZ_DZ)
                        fnd_s = pf(PF_UZ_ND)
                    else:
                        fz0_s = stackr(pick(z0c, mf) for mf, mi in peel)
                        fdzf_s = stackr(pick(dzc, mf) for mf, mi in peel)
                        fnd_s = stackr(pick(ndc, mf) for mf, mi in peel)
                    z_s = repr_(z)
                    dz_s = repr_(dz)
                    dp_s = repr_(d_prop)
                    inv_dzf = 1.0 / fdzf_s
                    m1 = (z_s - fz0_s) * inv_dzf
                    m2 = m1 + dz_s * dp_s * inv_dzf
                    # ceil anchor: the lowest integer index >= the window's
                    # lower edge -- one fewer candidate than a floor anchor
                    # needs (see _affine_collision_plan)
                    mlo = -jnp.floor(-(jnp.minimum(m1, m2)
                                       - margin * jnp.abs(inv_dzf)))
                    nd1 = fnd_s - 1.0
                    # candidate axis: stacked offsets from mlo
                    m_sc = jnp.clip(
                        jnp.concatenate([mlo + float(c) for c in range(NC)],
                                        axis=0), 0.0, repc(nd1))
                    z_c = repc(z_s)
                    dz_c = repc(dz_s)
                    dp_c = repc(dp_s)
                    fz0_c = repc(fz0_s)
                    fdzf_c = repc(fdzf_s)
                    oz = fz0_c + fdzf_c * m_sc - z_c
                    urdot = repc(Bd_s) + oz * dz_c
                    dr2 = repc(A2_s) + oz * oz
                    discr = urdot * urdot - dr2 + R2
                    sq = jnp.sqrt(jnp.maximum(discr, 0.0)) * inv_pancake
                    smin1 = urdot - sq
                    # smin2 >= 0 is implied by smin1 >= 0 (sq >= 0)
                    good = repc(sok_s) & (discr >= 0.0) \
                        & (smin1 >= 0.0) & (smin1 < dp_c)
                    sm3 = jnp.where(good, smin1, BIG) \
                        .reshape(NR * NC, RB, LANES)
                    dom3 = (repc(foff_s) + m_sc).reshape(NR * NC, RB, LANES)
                    best = jnp.min(sm3, axis=0)
                    onwin = sm3 == best[None]
                    hit = best < d_prop
                    hit_dist = jnp.where(hit, best, d_prop)
                    hit_dom = jnp.where(
                        hit, jnp.max(jnp.where(onwin, dom3, -1.0), axis=0),
                        0.0)
                    if spec.records:
                        sx_c = repc(stackr(pick(sxc, mf)
                                           for mf, mi in peel)) \
                            .reshape(NR * NC, RB, LANES)
                        sy_c = repc(stackr(pick(syc, mf)
                                           for mf, mi in peel)) \
                            .reshape(NR * NC, RB, LANES)
                        zd3 = (fz0_c + fdzf_c * m_sc) \
                            .reshape(NR * NC, RB, LANES)
                        pickw = lambda v3: jnp.max(
                            jnp.where(onwin, v3, -BIG), axis=0)
                        ctr_x = jnp.where(hit, pickw(sx_c), 0.0)
                        ctr_y = jnp.where(hit, pickw(sy_c), 0.0)
                        ctr_z = jnp.where(hit, pickw(zd3), 0.0)
            else:
                # general path: fetch the winner string's dense DOM-residual
                # rows by global string index (from the cell feature block)
                peel = []
                for _k in range(n_string_rounds):
                    mi, sidx = _min_and_idx(ranked, iota_C)
                    mask = (iota_C == sidx)
                    ranked = jnp.where(mask, BIG, ranked)
                    peel.append((mask.astype(jnp.float32), mi))
                round_best, round_dom = [], []
                round_ctr = []
                for mf, mi in peel:
                    s_ok = mi < BIG
                    sflat = jnp.sum(mf * sic, axis=0, keepdims=True)
                    ohs = ((iota_S == sflat.astype(jnp.int32)) & s_ok) \
                        .astype(jnp.bfloat16)
                    rel = _fetch(rel_splits, ohs, spec.splits)
                    # rows: dxr(Mp) dyr(Mp) dzr(Mp) valid(Mp) then 8 features
                    fxs = rel[4 * Mpad + 0:4 * Mpad + 1]
                    fys = rel[4 * Mpad + 1:4 * Mpad + 2]
                    fz0 = rel[4 * Mpad + 2:4 * Mpad + 3]
                    fdzf = rel[4 * Mpad + 3:4 * Mpad + 4]
                    foff = rel[4 * Mpad + 4:4 * Mpad + 5]
                    dom_xx = fxs + rel[0:Mpad]
                    dom_yy = fys + rel[Mpad:2 * Mpad]
                    dom_zz = fz0 + fdzf * iota_M + rel[2 * Mpad:3 * Mpad]
                    valid = (rel[3 * Mpad:4 * Mpad] > 0.5) & s_ok
                    slot_dom = foff + iota_M
                    ox = dom_xx - fx_
                    oy = dom_yy - fy_
                    oz = dom_zz - fz_
                    dr2 = ox * ox + oy * oy + oz * oz
                    urdot = ox * fdx + oy * fdy + oz * fdz
                    discr = urdot * urdot - dr2 + R2
                    sq = jnp.sqrt(jnp.maximum(discr, 0.0)) * inv_pancake
                    smin1 = urdot - sq
                    # smin2 >= 0 is implied by smin1 >= 0 (sq >= 0)
                    good = valid & (discr >= 0.0) \
                        & (smin1 >= 0.0) & (smin1 < fdp)
                    sm = jnp.where(good, smin1, BIG)
                    best = jnp.min(sm, axis=0, keepdims=True)
                    domb = jnp.max(jnp.where(sm == best, slot_dom, -1.0),
                                   axis=0, keepdims=True)
                    round_best.append(best)
                    round_dom.append(domb)
                    if spec.records:
                        onwin = sm == best
                        round_ctr.append(tuple(
                            jnp.max(jnp.where(onwin, v, -BIG), axis=0,
                                    keepdims=True)
                            for v in (dom_xx, dom_yy, dom_zz)))
                hit_f = jnp.zeros((1, BLK), bool)
                dist_f = fdp
                dom_f = jnp.zeros((1, BLK), jnp.float32)
                ctr_xf = jnp.zeros((1, BLK), jnp.float32)
                ctr_yf = jnp.zeros((1, BLK), jnp.float32)
                ctr_zf = jnp.zeros((1, BLK), jnp.float32)
                for ri_, (best, domb) in enumerate(zip(round_best,
                                                       round_dom)):
                    found = best < dist_f
                    hit_f = hit_f | found
                    dom_f = jnp.where(found, domb, dom_f)
                    dist_f = jnp.where(found, best, dist_f)
                    if spec.records:
                        cxr, cyr, czr = round_ctr[ri_]
                        ctr_xf = jnp.where(found, cxr, ctr_xf)
                        ctr_yf = jnp.where(found, cyr, ctr_yf)
                        ctr_zf = jnp.where(found, czr, ctr_zf)
                hit = tile(hit_f.astype(jnp.float32)) > 0.5
                hit_dist = tile(dist_f)
                hit_dom = tile(dom_f)
                if spec.records:
                    ctr_x = tile(ctr_xf)
                    ctr_y = tile(ctr_yf)
                    ctr_z = tile(ctr_zf)
            if "nosphere" in ablate and "nocull" not in ablate:
                # keep the cull live (data-dep on ranked), skip the DOM test
                hit = tile(jnp.min(ranked, axis=0, keepdims=True)) < -BIG
                hit_dist = d_prop
                hit_dom = jnp.zeros_like(x)
            if "nocull" in ablate:   # static: collision becomes dead code
                hit = jnp.zeros_like(x, bool)
                hit_dist = d_prop
                hit_dom = jnp.zeros_like(x)
            hit_act = hit & active

            if not spec.expected and spec.stopping:
                # stop-on-detection (detect estimator; engine.py:463-470)
                d_prop = jnp.where(hit_act, hit_dist, d_prop)
                absorbed = absorbed & ~hit_act
                scattered = scattered & ~hit_act
                abs_left_corr = jnp.where(hit_act, 0.0, abs_left_corr)

            # ---------- record (saveHit weight contract, kernel:370) -------
            # w0 = step.weight / bias(lambda) was precomputed at spawn
            w_hit = jnp.where(hit_act, w0, 0.0)
            if spec.expected:
                # continuous-absorption deposit: survival to the DOM entry
                # point, linearly interpolated within the segment
                # (engine.py:493-516); the photon passes through
                tau_start = spec.horizon - abs_left
                tau_seg = abs_left - abs_left_corr / abs_corr
                has_dp = d_prop > 0.0
                frac = jnp.where(
                    has_dp, hit_dist / jnp.where(has_dp, d_prop, 1.0), 0.0)
                w_hit = w_hit * jnp.exp(-(tau_start + frac * tau_seg))
                if spec.ang_poly:
                    ax_, ay_, az_ = spec.pmt_axis
                    cos_eta = jnp.clip(-(dx * ax_ + dy * ay_ + dz * az_),
                                       -1.0, 1.0)
                    ang = jnp.zeros_like(cos_eta)
                    for c_ in reversed(spec.ang_poly):
                        ang = ang * cos_eta + c_
                    w_hit = w_hit * jnp.maximum(ang, 0.0)
            t_hit = t + inv_gv * hit_dist
            tbin_f = (t_hit - pf(PF_HIST_T0)) * pf(PF_INV_HIST_DT)
            tbin = jnp.clip(jnp.floor(tbin_f), 0.0, float(NBINS - 1))
            flat_idx = hit_dom * float(NBINS) + tbin
            if "nohist" in ablate:     # static: bin-index math dead
                flat_idx = jnp.zeros_like(x)
            n_hits = n_hits + hit_act.astype(jnp.float32)
            w_sum = w_sum + w_hit
            inline_deposit = spec.expected or not spec.stopping
            if inline_deposit and "noexpflush" in ablate:
                pass          # probe: deposit cost of the inline path
            elif spec.expected:
                # deposits flush immediately: a pass-through photon can hit
                # again next iteration, so no pending registers
                if spec.soft:
                    fr_hi = jnp.clip(tbin_f - jnp.floor(tbin_f), 0.0, 1.0)
                    lo = jnp.clip(jnp.floor(tbin_f), 0.0, float(NBINS - 1))
                    hi = jnp.minimum(lo + 1.0, float(NBINS - 1))
                    _, _, head, n_dropped = flush(
                        hit_dom * float(NBINS) + lo, w_hit * (1.0 - fr_hi),
                        head, n_dropped)
                    _, _, head, n_dropped = flush(
                        hit_dom * float(NBINS) + hi, w_hit * fr_hi,
                        head, n_dropped)
                else:
                    _, _, head, n_dropped = flush(flat_idx, w_hit,
                                                  head, n_dropped)
            elif not spec.stopping:
                # non-stopping detect (STOP_PHOTONS_ON_DETECTION off): the
                # photon keeps flying past the DOM, so deposits flush
                # inline like the expected path (a lane can hit again next
                # iteration; pending registers would overwrite)
                _, _, head, n_dropped = flush(flat_idx, w_hit,
                                              head, n_dropped)
            else:
                # park hits in the pending registers (free: the lane just
                # died under stop-on-detection)
                pend_idx = jnp.where(hit_act, flat_idx, pend_idx)
                pend_w = jnp.where(hit_act, w_hit, pend_w)
                if spec.records and spec.rec_all:
                    # SAVE_ALL: record at the absorption point (prescaled on
                    # the scatter-azimuth row, which absorbed lanes never
                    # consume -- same row the engine uses), dom = 0, weight
                    # NEGATED as the record-only queue marker
                    rec_mask = active & absorbed & ~hit_act
                    if spec.rec_prescale < 1.0:
                        rec_mask = rec_mask & (u[7] < spec.rec_prescale)
                    t_abs = t + inv_gv * d_prop
                    tb_abs = jnp.clip(jnp.floor(
                        (t_abs - pf(PF_HIST_T0)) * pf(PF_INV_HIST_DT)),
                        0.0, float(NBINS - 1))
                    pend_idx = jnp.where(rec_mask, tb_abs, pend_idx)
                    pend_w = jnp.where(rec_mask, -w0, pend_w)
                    ctr_x = jnp.where(rec_mask, pf(PF_DOM0_X), ctr_x)
                    ctr_y = jnp.where(rec_mask, pf(PF_DOM0_Y), ctr_y)
                    ctr_z = jnp.where(rec_mask, pf(PF_DOM0_Z), ctr_z)
                    hit_dist = jnp.where(rec_mask, d_prop, hit_dist)
                else:
                    rec_mask = jnp.zeros_like(x, bool)
                if spec.records:
                    hit_act = hit_act | rec_mask  # record-position lanes
                    # DOM-relative record position with the pancake
                    # un-correction (engine.py record block /
                    # propagation_kernel.c.cl:340-355): shift the DOM
                    # center toward the closest-approach plane, then store
                    # hit point minus that center.  x/y/z freeze at these
                    # values after the advance (dead lane) so the flush
                    # reads them from state.
                    pxr = x - ctr_x
                    pyr = y - ctr_y
                    pzr = z - ctr_z
                    par = pxr * dx + pyr * dy + pzr * dz
                    fpk = (pancake - 1.0) / pancake
                    ddx_c = ctr_x + fpk * (pxr - par * dx)
                    ddy_c = ctr_y + fpk * (pyr - par * dy)
                    ddz_c = ctr_z + fpk * (pzr - par * dz)
                    rec_x = x + hit_dist * dx - ddx_c
                    rec_y = y + hit_dist * dy - ddy_c
                    rec_z = z + hit_dist * dz - ddz_c
                    rv["dist_abs"] = jnp.where(
                        hit_act, rv["abs_init"] - abs_left, rv["dist_abs"])

            # ---------- advance ----------
            actf = in_flight
            if "noadvance" not in ablate:
                x = x + actf * dx * d_prop
                y = y + actf * dy * d_prop
                z = z + actf * dz * d_prop
                t = t + actf * inv_gv * d_prop
                abs_left = jnp.where(active, abs_left_corr / abs_corr,
                                     abs_left)
            if not spec.expected and spec.records:
                x = jnp.where(hit_act, rec_x, x)
                y = jnp.where(hit_act, rec_y, y)
                z = jnp.where(hit_act, rec_z, z)
            # pre-retire activity: a photon's final segment counts as work
            n_work = n_work + actf

            # ---------- scatter survivors ----------
            do_scatter = scattered & active
            if spec.aniso:
                pdx0 = ca * dx + sa * dy
                pdy0 = -sa * dx + ca * dy
                n1_, n2_, n3_ = pdx0 * k1, pdy0 * k2, dz * kz
                oxp = ca * n1_ - sa * n2_
                oyp = sa * n1_ + ca * n2_
                inv_n = 1.0 / jnp.sqrt(oxp * oxp + oyp * oyp + n3_ * n3_)
                pdx, pdy, pdz = oxp * inv_n, oyp * inv_n, n3_ * inv_n
            else:
                pdx, pdy, pdz = dx, dy, dz
            if spec.scat_table:
                # water: Rayleigh (closed cubic,
                # I3CLSimRandomValueRayleighScatteringCosAngle.cxx) mixed
                # with a tabulated phase-function ANGLE distribution
                # (engine.py water branch; Petzold tables)
                br = 0.835
                pr = 1.0 / br
                qr = (br + 3.0) * (u[6] - 0.5) / br
                dr_ = qr * qr + pr * pr * pr
                sqd = jnp.sqrt(dr_)
                u1c = -qr + sqd
                u1c = jnp.sign(u1c) * jnp.abs(u1c) ** (1.0 / 3.0)
                v1c = -qr - sqd
                v1c = jnp.sign(v1c) * jnp.abs(v1c) ** (1.0 / 3.0)
                ray = jnp.clip(u1c + v1c, -1.0, 1.0)
                us_f = flat(u[6])
                scmp = sacu_col[:, 0:1] <= us_f
                snxt = sacu_col[:, 1:2] <= us_f
                sohf = (scmp & ~snxt).astype(jnp.bfloat16)
                scols = _fetch(sco_splits, sohf, spec.splits)  # (5, BLK)
                sargs = [tile(scols[c:c + 1]) for c in range(5)]
                angle = _interp_solve(tile(us_f), *sargs)
                cos_s = jnp.where(u[5] < pf(PF_LIU_FRAC), ray,
                                  jnp.cos(angle))
            else:
                g = pf(PF_MEAN_COS)
                beta_liu = (1.0 - g) / (1.0 + g)
                liu = jnp.clip(2.0 * u[6] ** beta_liu - 1.0, -1.0, 1.0)
                g_safe = jnp.where(jnp.abs(g) < 1e-6, 1e-6, g)
                svar = 2.0 * u[6] - 1.0
                frac2 = (1.0 - g_safe * g_safe) / (1.0 + g_safe * svar)
                hg = (1.0 + g_safe * g_safe - frac2 * frac2) / (2.0 * g_safe)
                hg = jnp.where(jnp.abs(g) < 1e-6, svar,
                               jnp.clip(hg, -1.0, 1.0))
                cos_s = jnp.where(u[5] < pf(PF_LIU_FRAC), liu, hg)
            sin_s = jnp.sqrt(jnp.maximum(1.0 - cos_s * cos_s, 0.0))
            sdx2, sdy2, sdz2 = _scatter_dir(cos_s, sin_s, pdx, pdy, pdz, u[7])
            if spec.aniso:
                m1 = ca * sdx2 + sa * sdy2
                m2 = -sa * sdx2 + ca * sdy2
                n1_, n2_, n3_ = m1 / k1, m2 / k2, sdz2 / kz
                oxp = ca * n1_ - sa * n2_
                oyp = sa * n1_ + ca * n2_
                inv_n = 1.0 / jnp.sqrt(oxp * oxp + oyp * oyp + n3_ * n3_)
                sdx2, sdy2, sdz2 = oxp * inv_n, oyp * inv_n, n3_ * inv_n
            if "noscatter" in ablate:  # static: scatter math above is dead
                sdx2, sdy2, sdz2 = dy, dz, dx
            dx = jnp.where(do_scatter, sdx2, dx)
            dy = jnp.where(do_scatter, sdy2, dy)
            dz = jnp.where(do_scatter, sdz2, dz)
            if spec.records:
                rv["n_scat"] = rv["n_scat"] \
                    + do_scatter.astype(jnp.float32)

            # ---------- retire ----------
            died = active & (absorbed | (abs_left < EPSILON))
            if not spec.expected and spec.stopping:
                died = died | hit_act
            in_flight = jnp.where(died, 0.0, in_flight)

            rtail = (tuple(rv[f] for f in REC_STATE_FIELDS)
                     if spec.records else ())
            return (photons_left, in_flight, x, y, z, t, dx, dy, dz, w0,
                    inv_gv, abs_left, gsv, pav, qav, rav, pend_idx, pend_w) \
                + rtail + (head, n_gen, n_hits, w_sum, n_dropped, n_work)

        def outer_body(oi, carry):
            # flush_every inner iterations, then one unconditional flush
            # (a static structure: no data-dependent control flow needed)
            def live(carry):
                se = spec.spawn_every
                uf = spec.unroll
                if se == 1:
                    # manual unrolling (Mosaic's fori unroll only supports
                    # full unroll): uf body calls per loop trip amortize the
                    # ~1.6 us/block per-trip overhead (probe_pallas8)
                    def inner(ii, c):
                        for j in range(uf):
                            c = body(oi * spec.flush_every + ii * uf + j,
                                     c, True)
                        return c
                    carry = jax.lax.fori_loop(0, spec.flush_every // uf,
                                              inner, carry)
                else:
                    # statically scheduled spawn: one spawning iteration,
                    # then se-1 spawn-free iterations.  The whole group's
                    # uniforms come from ONE PRNG draw+convert (the draw is
                    # state-independent, so hoisting it both amortizes the
                    # PRNG issue cost and unblocks the iteration pipeline).
                    hoist_rng = "norng" not in ablate

                    def one_group(gi, c):
                        base = oi * spec.flush_every + gi * se
                        if not hoist_rng:
                            c = body(base, c, True)

                            def nospawn(k, c2):
                                return body(base + 1 + k, c2, False)
                            return jax.lax.fori_loop(0, se - 1, nospawn, c)
                        nrows = 8 + 4 * (se - 1)
                        uu = pltpu.prng_random_bits((nrows * RB, LANES))
                        u0 = [uu[r * RB:(r + 1) * RB, :] for r in range(8)]
                        c = body(base, c, True, u_pre=u0)
                        for k in range(se - 1):
                            off = 8 + 4 * k
                            uk = [None] * 4 + [
                                uu[(off + j) * RB:(off + j + 1) * RB, :]
                                for j in range(4)]
                            c = body(base + 1 + k, c, False, u_pre=uk)
                        return c
                    def group(gi, c):
                        for j in range(uf):
                            c = one_group(gi * uf + j, c)
                        return c
                    carry = jax.lax.fori_loop(0, spec.flush_every // (se * uf),
                                              group, carry)
                if "noflush" in ablate or spec.expected \
                        or not spec.stopping:
                    # inline-deposit modes flush per iteration; the
                    # pending registers stay zero
                    zero_ = jnp.zeros_like(carry[IDX_PEND_W])
                    pend_idx, pend_w, head, n_dropped = (
                        zero_, zero_, carry[nsf], carry[nsf + 4])
                else:
                    rec = None
                    if spec.records:
                        rm = dict(zip(REC_STATE_FIELDS, carry[NSF:nsf]))
                        rec = {"pos_x": carry[2], "pos_y": carry[3],
                               "pos_z": carry[4], "time": carry[5],
                               "dir_x": carry[6], "dir_y": carry[7],
                               "dir_z": carry[8],
                               "wavelength": rm["wlen"],
                               "identifier": stp["identifier"],
                               "start_x": rm["start_x"],
                               "start_y": rm["start_y"],
                               "start_z": rm["start_z"],
                               "start_time": rm["start_t"],
                               "start_dx": rm["sdx"],
                               "start_dy": rm["sdy"],
                               "start_dz": rm["sdz"],
                               "inv_gv": carry[10],
                               "num_scatters": rm["n_scat"],
                               "dist_in_abs_lens": rm["dist_abs"]}
                    pend_idx, pend_w, head, n_dropped = flush(
                        carry[IDX_PEND_I], carry[IDX_PEND_W], carry[nsf],
                        carry[nsf + 4], rec=rec)
                return carry[:IDX_PEND_I] + (pend_idx, pend_w) \
                    + carry[IDX_PEND_W + 1:nsf] + (head,) \
                    + carry[nsf + 1:nsf + 4] + (n_dropped,) \
                    + carry[nsf + 5:]

            # per-block early exit: a drained block (no photons left to
            # spawn, none in flight, nothing pending) skips its physics --
            # the TPU form of the reference's per-work-item
            # `photonsLeftToPropagate > 0` loop exit
            # (propagation_kernel.c.cl:536): whole blocks retire instead of
            # lanes, so tail calls only pay for live blocks.
            block_live = (jnp.sum(carry[0]) + jnp.sum(carry[1])
                          + jnp.sum(carry[IDX_PEND_W])) > 0.0
            return jax.lax.cond(block_live, live, lambda c: c, carry)

        st = [ld(state_ref, f) for f in range(nsf)]
        zero = jnp.zeros((), jnp.float32)
        zl = jnp.zeros((RB, LANES), jnp.float32)   # per-lane accumulators
        carry0 = tuple(st) + (jnp.zeros((), jnp.int32), zl, zl, zl,
                              zero, zl)
        final = jax.lax.fori_loop(0, T // spec.flush_every, outer_body,
                                  carry0)

        for f in range(nsf):
            state_out[pl.ds(f * RB, RB), :] = final[f]

        head, n_gen, n_hits, w_sum, n_dropped, n_work = final[nsf:]
        n_gen = jnp.sum(n_gen)
        n_hits = jnp.sum(n_hits)
        w_sum = jnp.sum(w_sum)
        n_work = jnp.sum(n_work)
        alive = jnp.sum(((final[1] > 0.5) | (final[0] > 0.5))
                        .astype(jnp.float32))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        cnt = jnp.where(lane_i == CNT_GEN, n_gen, 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_HITS, n_hits, 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_WSUM, w_sum, 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_DROPPED, n_dropped, 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_ALIVE, alive, 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_QUEUED,
                              head.astype(jnp.float32), 0.0)
        cnt = cnt + jnp.where(lane_i == CNT_WORK, n_work, 0.0)
        cnt_out[:] = jnp.concatenate(
            [cnt, jnp.zeros((7, LANES), jnp.float32)], axis=0)

    return kernel


# ---------------------------------------------------------------------------
# host-side input preparation
# ---------------------------------------------------------------------------

def _pad2(a, rmult=8, cmult=8, fill=0.0):
    """Pad a traced 2-D array to multiples (jnp; differentiable-safe)."""
    a = jnp.asarray(a, jnp.float32)
    rp = (-a.shape[0]) % rmult
    cp = (-a.shape[1]) % cmult
    return jnp.pad(a, ((0, rp), (0, cp)), constant_values=fill)


def fused_supported(medium: MediumProperties, spectra: SpectrumTable,
                    cfg: PropagationConfig) -> Optional[str]:
    """None if the fused kernel handles this configuration, else the reason
    the caller must fall back to the engine."""
    if medium.medium_kind not in ("icecube", "water", "separable_table"):
        return f"medium kind {medium.medium_kind!r} (engine only)"
    if medium.medium_kind == "water" and medium.water_abs_inv is None:
        return "water medium without wavelength tables"
    if medium.medium_kind == "separable_table" and medium.fac_qa is None:
        return "separable-table medium without factor tables"
    if (medium.scattering.kind != "icecube"
            and medium.scattering.table_cos is None):
        return "tabulated scattering distribution without tables"
    if cfg.estimator == "detect":
        if cfg.soft_binning:
            return "soft binning is fused only with estimator='expected'"
    elif cfg.estimator != "expected":
        return f"estimator {cfg.estimator!r} not fused"
    if cfg.save_photons:
        if cfg.estimator != "detect" or not cfg.stop_on_detection:
            return "photon records fused only with stopping detect"
        if cfg.photon_history_entries > 0:
            return "photon scatter-history records not fused"
    return None


def _affine_collision_plan(geo: DetectorGeometry, cfg: PropagationConfig,
                           ablate: str = ""):
    """(affine_ok, n_candidates): whether every DOM sits exactly at
    z0 + m*dz on its (vertical) string, and how many candidate indices the
    max segment length can overlap.  Mirrors the reference's geometry-
    specialized codegen (GenerateGeometrySource emits per-stringset layer
    tables only when the layout allows)."""
    if "noaffine" in ablate:
        return False, 0
    rel = np.asarray(geo.string_dom_rel)       # (S, M, 4): dx dy dz valid
    valid = rel[:, :, 3] > 0.5
    if not valid.any():
        return False, 0
    for c in range(3):
        if np.abs(np.where(valid, rel[:, :, c], 0.0)).max() > 1e-4:
            return False, 0
    feats = np.asarray(geo.string_features)
    nd = feats[:, 7]
    dzf = feats[:, 5]
    multi = nd > 1
    if np.any(multi & (dzf == 0.0)):
        return False, 0
    min_dz = float(np.abs(dzf[multi]).min()) if multi.any() else 1.0
    margin = geo.collision_radius + 1.0
    # the kernel anchors its candidate enumeration at ceil(lowest needed
    # index), so ceil(span) + 1 indices always cover the window (at most
    # floor(span)+1 integers fit in a span, +1 for the fractional anchor)
    n_cand = int(np.ceil((cfg.max_segment_m + 2 * margin) / min_dz)) + 1
    if n_cand > 16:
        return False, 0
    return True, n_cand


def _grid_search(sx, sy, reach, max_cells=512, n_feat=10):
    """Pick the cheapest 2-D cell grid for one string set: per grid cell,
    the candidate list is every string reachable from a segment starting in
    that cell (within max_segment + string reach).  Returns
    (cell, nx, ny, lists, Kp, NCp, gx0, gy0)."""
    gx0 = float((sx - reach).min())
    gx1 = float((sx + reach).max())
    gy0 = float((sy - reach).min())
    gy1 = float((sy + reach).max())
    base = float(reach.max())

    best = None
    mults = (0.5, 0.75, 1.0, 1.5, 2.0, 4.0, 1e9)
    import os as _os
    if _os.environ.get("CLSIM_CELL_MULT"):
        mults = (float(_os.environ["CLSIM_CELL_MULT"]),)
    for mult in mults:
        cell = base * mult
        nx = max(int(np.ceil((gx1 - gx0) / cell)), 1)
        ny = max(int(np.ceil((gy1 - gy0) / cell)), 1)
        if nx * ny > max_cells:
            continue
        lists = []
        kmax = 1
        for i in range(nx):
            bx0, bx1 = gx0 + i * cell, gx0 + (i + 1) * cell
            ddx = np.maximum(np.maximum(bx0 - sx, sx - bx1), 0.0)
            for j in range(ny):
                by0, by1 = gy0 + j * cell, gy0 + (j + 1) * cell
                ddy = np.maximum(np.maximum(by0 - sy, sy - by1), 0.0)
                cand = np.nonzero(np.hypot(ddx, ddy) <= reach)[0]
                lists.append(cand)
                kmax = max(kmax, len(cand))
        Kp = -(-kmax // 8) * 8
        NCp = -(-(nx * ny) // 8) * 8
        # per-lane op model: one-hot build (NCp compares) + per-candidate
        # cull math (~26 VPU ops) + the bf16-split MXU fetch, whose row
        # count quantizes to 128-row tiles (measured: the fetch is a
        # first-order cost at large Kp*NCp)
        tiles = -(-n_feat * Kp // 128)
        cost = 2 * NCp + 26 * Kp + 6 * tiles * NCp
        if best is None or cost < best[0]:
            best = (cost, cell, nx, ny, lists, Kp, NCp)
    _, cell, nx, ny, lists, Kp, NCp = best
    return cell, nx, ny, lists, Kp, NCp, gx0, gy0


def _max_simultaneous(sx, sy, maxr, seg) -> int:
    """Static upper bound on how many strings of this set one segment can
    cull simultaneously: two strings can both pass the point-to-segment
    test only if their 2-D separation <= segment length + both radial
    reaches, so any co-passing set lies inside every member's
    possible-pair neighborhood -- the max neighborhood size (incl. self)
    bounds the set.  Test rounds beyond this bound provably never find
    anything (the reference tests every culled string,
    sparse_collision_kernel.c.cl:462-587; engine parity holds because the
    engine's extra global rounds also find nothing)."""
    sx = np.asarray(sx, np.float64)
    sy = np.asarray(sy, np.float64)
    maxr = np.asarray(maxr, np.float64)
    D = np.hypot(sx[:, None] - sx[None, :], sy[:, None] - sy[None, :])
    possible = D <= seg + maxr[:, None] + maxr[None, :]
    return int(possible.sum(axis=1).max())


# observability for the per-subdetector split (round-4 review Weak #6):
# geometries that silently fall back to the single global plan lose the
# split's measured 1.3-2x collision-stage win, so the fallback is warned
# about and counted here (reset-able; surfaced by tests and profiling)
SUBPLAN_FALLBACKS = {"count": 0, "reason": None}


def plan_collision(geo: DetectorGeometry, cfg: PropagationConfig,
                   ablate: str = ""):
    """Unified host-side collision planning: per-subdetector SubPlans when
    the geometry allows, else the legacy single global cell plan.  Returns
    (cell_tab_np, plan_dict) ready for _build_spec(plan=...)."""
    sub, reason = _subdet_plans(geo, cfg, ablate)
    if sub is not None:
        cell_tab, plans = sub
        return cell_tab, dict(sub_plans=plans)
    if reason is not None and "ablate" not in reason:
        SUBPLAN_FALLBACKS["count"] += 1
        SUBPLAN_FALLBACKS["reason"] = reason
        import warnings
        warnings.warn(
            "per-subdetector collision split unavailable for this geometry "
            f"({reason}); using the single global collision plan, which "
            "costs ~1.3-2x more collision time per iteration on mixed-"
            "density detectors (reference handles <=9 subdetectors, "
            "sparse_collision_kernel.c.cl DO_CHECK)",
            UserWarning, stacklevel=3)
    return _cell_plan(geo, cfg)


def _subdet_plans(geo: DetectorGeometry, cfg: PropagationConfig,
                  ablate: str = ""):
    """Build per-subdetector SubPlans when the geometry allows: affine
    DOM placement and few (z0, dz, nd) groups, each uniform within itself.
    Returns ((cell_tab, plans), None) or (None, reason) -- the caller
    falls back to the legacy single global plan and surfaces the reason."""
    for flag in ("noaffine", "nosubdet", "nocull", "nosphere",
                 "cullfetchonly"):
        if flag in ablate:
            return None, f"ablate flag {flag!r}"
    affine_ok, _ = _affine_collision_plan(geo, cfg, ablate)
    if not affine_ok:
        return None, ("non-affine DOM placement (DOMs off the z0+m*dz "
                      "ladder or z-candidate window > 16)")
    feats = np.asarray(geo.string_features, np.float64)   # (S, 8)
    keys = [tuple(np.round(feats[s, [4, 5, 7]], 6)) for s in
            range(feats.shape[0])]
    groups = {}
    for s, k in enumerate(keys):
        groups.setdefault(k, []).append(s)
    if len(groups) > 4:
        return None, (f"{len(groups)} (z0, dz, nd) string groups exceed "
                      "the 4-SubPlan budget")
    sxa = np.asarray(geo.string_x, np.float64)
    sya = np.asarray(geo.string_y, np.float64)
    smaxr = np.asarray(geo.string_max_r, np.float64)
    margin = geo.collision_radius + 1.0
    seg = float(cfg.max_segment_m)

    plans = []
    blocks = []
    row_off = 0
    width = 0
    for key, idx in sorted(groups.items(), key=lambda kv: -len(kv[1])):
        idx = np.asarray(idx)
        z0, dzf, nd = key
        dz_abs = abs(dzf) if nd > 1 else 1.0
        n_cand = int(np.ceil((seg + 2 * margin) / dz_abs)) + 1
        if n_cand > 16:
            return None, (f"group dz={dz_abs:.1f} m needs {n_cand} "
                          "z-candidates (> 16) at max_segment_m="
                          f"{seg:.0f}")
        rounds = min(cfg.strings_per_photon,
                     _max_simultaneous(sxa[idx], sya[idx], smaxr[idx], seg))
        reach = seg + smaxr[idx] + 1.0
        cell, nx, ny, lists, Kp, NCp, gx0, gy0 = _grid_search(
            sxa[idx], sya[idx], reach, n_feat=4)
        # per-group table block: 4 feature-major rows [sx, sy, maxr2, off]
        tab = np.zeros((4 * Kp, NCp), np.float32)
        tab[2 * Kp:3 * Kp, :] = -1.0       # maxr2 padding fails the cull
        maxr2 = smaxr ** 2
        for ci, cand in enumerate(lists):
            for k, s_local in enumerate(cand):
                s = int(idx[s_local])
                col = [feats[s, 0], feats[s, 1], maxr2[s], feats[s, 6]]
                for f in range(4):
                    tab[f * Kp + k, ci] = col[f]
        z1 = z0 + dzf * (nd - 1)
        plans.append(SubPlan(
            n_cells=NCp, K_cand=Kp, x0=gx0, y0=gy0, inv_cell=1.0 / cell,
            nx=nx, ny=ny, n_dom_cand=n_cand, rounds=rounds,
            uz_z0=float(z0), uz_dz=float(dzf if dzf != 0.0 else 1.0),
            uz_nd=float(nd), minz=float(min(z0, z1)),
            maxz=float(max(z0, z1)), row_off=row_off))
        blocks.append(tab)
        row_off += tab.shape[0]
        width = max(width, NCp)
    # engine parity: the engine tests the global top-strings_per_photon by
    # rank; the split tests up to sum(rounds) strings.  When every group's
    # rounds equal its static max-simultaneous bound and the total fits in
    # the engine's budget, both test the FULL culled set -- identical
    # accept sets.  Otherwise fall back to the global plan.
    if sum(p.rounds for p in plans) > cfg.strings_per_photon \
            and len(plans) > 1:
        return None, ("per-group round sum "
                      f"{sum(p.rounds for p in plans)} exceeds the "
                      f"engine's strings_per_photon="
                      f"{cfg.strings_per_photon} parity budget")
    cell_tab = np.zeros((row_off, width), np.float32)
    r = 0
    for tab in blocks:
        # padding columns beyond a narrow group's width keep maxr2 = -1
        cell_tab[r:r + tab.shape[0], :tab.shape[1]] = tab
        cell_tab[r + (tab.shape[0] // 4) * 2:
                 r + (tab.shape[0] // 4) * 3, tab.shape[1]:] = -1.0
        r += tab.shape[0]
    return (cell_tab, tuple(plans)), None


def _cell_plan(geo: DetectorGeometry, cfg: PropagationConfig):
    """Static 2-D cell-grid cull plan (numpy; geometry is static).

    The TPU analog of the reference's per-subdetector cell grid
    (I3CLSimHelperGenerateGeometrySource.cxx cell tables;
    sparse_collision_kernel.c.cl:194-460): precompute, per grid cell, every
    string a segment *starting* in that cell could reach within
    max_segment_m + string_max_r (string_max_r already includes the
    collision radius).  Equivalent to the dense all-strings cull because a
    string outside that reach can never pass the point-to-segment test.

    Returns (cell_tab, plan): cell_tab is (10*K_cand, NC_pad) f32 with
    feature-major rows [sx, sy, maxr2, off, minz, maxz, z0, dzf, nd, sidx]
    per candidate (optional blocks last so specialized modes can fetch a
    prefix); plan carries the static grid constants for the spec.
    """
    sx = np.asarray(geo.string_x, np.float64)
    sy = np.asarray(geo.string_y, np.float64)
    smaxr = np.asarray(geo.string_max_r, np.float64)
    feats = np.asarray(geo.string_features, np.float64)   # (S, 8)
    reach = float(cfg.max_segment_m) + smaxr + 1.0        # (S,) per string
    cell, nx, ny, lists, Kp, NCp, gx0, gy0 = _grid_search(sx, sy, reach,
                                                          n_feat=10)

    tab = np.zeros((10 * Kp, NCp), np.float32)
    tab[2 * Kp:3 * Kp, :] = -1.0          # maxr2: padding fails the cull
    tab[7 * Kp:8 * Kp, :] = 1.0           # dzf: keep index math finite
    tab[8 * Kp:9 * Kp, :] = 1.0           # nd
    tab[9 * Kp:10 * Kp, :] = -1.0         # sidx: padding selects nothing
    maxr2 = np.asarray(geo.string_max_r, np.float64) ** 2
    for ci, cand in enumerate(lists):
        for k, s in enumerate(cand):
            # feature order [sx sy maxr2 off minz maxz z0 dzf nd sidx]:
            # specialized modes fetch a prefix (see _make_kernel)
            col = [feats[s, 0], feats[s, 1], maxr2[s], feats[s, 6],
                   feats[s, 2], feats[s, 3], feats[s, 4],
                   feats[s, 5] if feats[s, 5] != 0.0 else 1.0,
                   feats[s, 7], float(s)]
            for f in range(10):
                tab[f * Kp + k, ci] = col[f]
    plan = dict(n_cull_cells=NCp, K_cand=Kp, cell_x0=gx0, cell_y0=gy0,
                inv_cell=1.0 / cell, cell_nx=nx, cell_ny=ny)
    return tab, plan


def _build_spec(medium, geo: DetectorGeometry, spectra, cfg,
                n_slots, iters_per_call, flush_every, queue_rows,
                block_lanes, splits, external_uniforms, interpret,
                ablate="", spawn_every=1, plan=None,
                unroll=1, flush_rows=None, threefry=False) -> FusedSpec:
    S, M, _ = geo.string_dom_rel.shape
    K = cfg.max_layer_steps
    tilt_enabled = medium.tilt.enabled
    nd = int(medium.tilt.distances.shape[0]) if tilt_enabled else 0
    nz = int(medium.tilt.z_corrections.shape[1]) if tilt_enabled else 0
    affine_ok, n_cand = _affine_collision_plan(geo, cfg, ablate)
    feats_np = np.asarray(geo.string_features)
    uniform_z = bool(
        affine_ok
        and np.ptp(feats_np[:, 4]) == 0.0     # z0
        and np.ptp(feats_np[:, 5]) == 0.0     # dz
        and np.ptp(feats_np[:, 7]) == 0.0)    # nd
    return FusedSpec(
        n_blocks=n_slots // block_lanes,
        block_lanes=block_lanes,
        iters_per_call=iters_per_call,
        flush_every=flush_every,
        queue_rows=queue_rows,
        # per-flush compaction cap: detect-mode hits are rare (<= one per
        # lane per flush window), but the expected estimator deposits on
        # EVERY DOM crossing and coherent workloads (beams) can exceed a
        # small cap in one iteration -- entries beyond it are DROPPED
        # (CNT_DROPPED), so expected mode defaults higher
        flush_rows=(min(flush_rows, queue_rows) if flush_rows
                    else min(8 if (cfg.estimator == "expected"
                                   or not cfg.stop_on_detection) else 4,
                             queue_rows)),
        K=K,
        L=medium.n_layers,
        Lpad=-(-(medium.n_layers + K) // 8) * 8,
        Spad=-(-S // 8) * 8,
        Mpad=-(-M // 8) * 8,
        n_spec=int(np.shape(spectra.x)[1]),
        n_tables=int(np.shape(spectra.x)[0]),
        n_bias=int(np.shape(spectra.bias_x)[0]),
        bias_uniform=bool(
            np.shape(spectra.bias_x)[0] < 2
            or np.allclose(np.diff(np.asarray(spectra.bias_x)),
                           float(np.asarray(spectra.bias_x)[1])
                           - float(np.asarray(spectra.bias_x)[0]),
                           rtol=1e-5)),
        nz_tilt=nz if tilt_enabled else 0,
        nd_tilt=nd,
        aniso=medium.anisotropy.enabled,
        hist_n_bins=cfg.hist_n_bins,
        splits=splits,
        external_uniforms=external_uniforms,
        interpret=interpret,
        ablate=ablate,
        affine_doms=affine_ok,
        n_dom_cand=n_cand,
        spawn_every=1 if (external_uniforms or threefry) else spawn_every,
        n_string_rounds=cfg.strings_per_photon,
        uniform_z=uniform_z,
        threefry=threefry,
        records=bool(cfg.save_photons and cfg.estimator == "detect"),
        rec_all=bool(cfg.save_photons and cfg.save_all_photons),
        rec_prescale=float(cfg.save_all_prescale),
        unroll=unroll,
        expected=cfg.estimator == "expected",
        stopping=cfg.stop_on_detection,
        fixed_abs=(cfg.fixed_abs_lens > 0
                   and cfg.estimator == "detect"),
        soft=cfg.soft_binning,
        ang_poly=tuple(cfg.expected_angular_poly or ()),
        pmt_axis=tuple(cfg.pmt_axis),
        horizon=(float(cfg.fixed_abs_lens) if cfg.fixed_abs_lens > 0
                 else 46.0),
        medium_tables=medium.medium_kind != "icecube",
        n_wtab=(int(np.shape(medium.water_abs_inv
                             if medium.medium_kind == "water"
                             else medium.fac_qa)[0])
                if medium.medium_kind != "icecube" else 0),
        ref_table=medium.ref_n_table is not None,
        scat_table=medium.scattering.kind != "icecube",
        n_scat=(int(np.shape(medium.scattering.table_cos)[0])
                if medium.scattering.kind != "icecube" else 0),
        **(plan or {}),
    )


def _build_tables(spec: FusedSpec, medium: MediumProperties,
                  geo: DetectorGeometry, spectra: SpectrumTable,
                  cfg: PropagationConfig):
    """Device-side (traced) table construction; runs inside the jit."""
    K = spec.K
    # directional walk window: (L+K, 3(K+1)) -> transposed
    # (3(K+1)pad, Lpad=pad(L+K)); column j0+K (up) / j0 (down) holds the
    # photon's ascending (K+1)-layer band -- HALF the fetched rows of the
    # old symmetric 2K+1 window (the fetch was the kernel's largest
    # single MXU cost, ~46 us/iter of the ~110 us walk stage)
    Wb = directional_window_table(medium.b400, K)
    Wa = directional_window_table(medium.a_dust400, K)
    Wt = directional_window_table(medium.delta_tau, K)
    walk = _pad2(jnp.concatenate([Wb, Wa, Wt], axis=1).T, fill=1e-3)

    if spec.nz_tilt:
        p = medium.tilt
        nd, nz = p.z_corrections.shape
        zc = p.z_corrections
        # rows [zc[d, kz], zc[d, kz+1]] per distance column d, grouped by 8
        # z-columns: row (lo*2nd + r) of group column hi holds z-column
        # hi*8+lo -- fetched by ONE one-hot over the ~(nz-1)/8 groups, the
        # sub-column resolved with 8 in-kernel selects
        rows = jnp.stack([zc[:, :-1], zc[:, 1:]], axis=1).reshape(
            2 * nd, nz - 1)
        tilt_tab = _pad2(rows)
    else:
        tilt_tab = jnp.zeros((8, 8), jnp.float32)

    # stacked per-source-type spectra: table s owns rows [s*npad, (s+1)*npad)
    # of the CDF columns and the coefficient table; column 2 carries the
    # table index for the kernel's source_type row mask
    npad = -(-spec.n_spec // 8) * 8
    n = spec.n_spec
    acu_blocks, co_tab = [], jnp.zeros((8, spec.n_tables * npad), jnp.float32)
    for s in range(spec.n_tables):
        acu = jnp.asarray(spectra.acu[s], jnp.float32)
        acu_pad = _pad2(acu[:, None], rmult=npad, cmult=1, fill=2.0)[:npad, 0]
        acu_next = jnp.concatenate([acu_pad[1:],
                                    jnp.full((1,), 2.0, jnp.float32)])
        spec_id = jnp.full((npad,), float(s), jnp.float32)
        acu_blocks.append(jnp.stack(
            [acu_pad, acu_next, spec_id, jnp.zeros((npad,), jnp.float32)],
            axis=1))                                          # (npad, 4)
        xs = jnp.asarray(spectra.x[s], jnp.float32)
        beta = jnp.asarray(spectra.beta[s], jnp.float32)
        co = jnp.stack([xs[:-1], xs[1:], beta[:-1], beta[1:], acu[:-1]],
                       axis=0)                                # (5, n-1)
        co_tab = jax.lax.dynamic_update_slice(co_tab, co, (0, s * npad))
        # padded segments must keep x1 > x0 (slope denominator)
        co_tab = co_tab.at[1, s * npad + n - 1:(s + 1) * npad].set(1.0)
    acu_col = jnp.concatenate(acu_blocks, axis=0)   # (n_tables*npad, 4)

    by = jnp.asarray(spectra.bias_y, jnp.float32)
    bx = jnp.asarray(spectra.bias_x, jnp.float32)
    # rows [y0, y1, x0, x1, x1_cmp]: x1_cmp's LAST segment is pushed past
    # the grid end so the clamp-to-xmax wavelength still selects exactly one
    # segment; padded columns get x0 = BIG (never selected)
    x1cmp = jnp.concatenate([bx[1:-1], bx[-1:] + 1.0])
    bias_tab = _pad2(jnp.stack([by[:-1], by[1:], bx[:-1], bx[1:], x1cmp],
                               axis=0))                       # (5->8, nbpad)
    nbp = bias_tab.shape[1]
    if nbp > spec.n_bias - 1:
        pad_col = jnp.zeros(nbp - (spec.n_bias - 1), jnp.float32) + BIG
        bias_tab = bias_tab.at[2, spec.n_bias - 1:].set(pad_col)

    # water/photonics wavelength-factor tables (rows: gs/pa/qa/ra [n g] as
    # (k, k+1) pairs for the spawn-time lerp fetch)
    if spec.medium_tables:
        if medium.medium_kind == "water":
            zw = jnp.zeros_like(medium.water_abs_inv)
            facs = [medium.water_scat_inv, zw, medium.water_abs_inv, zw]
        else:   # separable_table (photonics)
            facs = [medium.fac_gs, medium.fac_pa, medium.fac_qa,
                    medium.fac_ra]
        if spec.ref_table:
            facs += [medium.ref_n_table, medium.ref_g_table]
        rows = []
        for f in facs:
            f = jnp.asarray(f, jnp.float32)
            rows += [f[:-1], f[1:]]
        wtab = _pad2(jnp.stack(rows, axis=0), rmult=16)    # (16, nw-1 pad)
    else:
        wtab = jnp.zeros((16, 8), jnp.float32)

    # tabulated scattering-angle CDF (water): same (acu columns + coefficient
    # rows) layout as the wavelength sampler
    if spec.scat_table:
        sx_ = jnp.asarray(medium.scattering.table_cos, jnp.float32)
        sacu = jnp.asarray(medium.scattering.table_cdf[0], jnp.float32)
        sbeta = jnp.asarray(medium.scattering.table_cdf[1], jnp.float32)
        nsp = -(-spec.n_scat // 8) * 8
        sacu_pad = _pad2(sacu[:, None], rmult=nsp, cmult=1,
                         fill=2.0)[:nsp, 0]
        sacu_next = jnp.concatenate([sacu_pad[1:],
                                     jnp.full((1,), 2.0, jnp.float32)])
        sacu_col = jnp.stack(
            [sacu_pad, sacu_next, jnp.zeros((nsp,), jnp.float32),
             jnp.zeros((nsp,), jnp.float32)], axis=1)
        sco = jnp.zeros((8, nsp), jnp.float32)
        sco = jax.lax.dynamic_update_slice(
            sco, jnp.stack([sx_[:-1], sx_[1:], sbeta[:-1], sbeta[1:],
                            sacu[:-1]], axis=0), (0, 0))
        sco = sco.at[1, spec.n_scat - 1:].set(1.0)
    else:
        sacu_col = jnp.zeros((8, 4), jnp.float32)
        sco = jnp.zeros((8, 8), jnp.float32)

    S, M, _ = geo.string_dom_rel.shape
    feats = geo.string_features  # (S, 8): x y minz maxz z0 dzf off ndoms
    if spec.affine_doms:
        # affine mode: the cell table carries every needed feature
        rel = jnp.zeros((8, spec.Spad), jnp.float32)
    else:
        # rel table rows: dx(Mp) dy(Mp) dz(Mp) valid(Mp) + 8 feature rows
        rel = jnp.zeros((4 * spec.Mpad + 8, spec.Spad), jnp.float32)
        for c in range(4):
            rel = rel.at[c * spec.Mpad:c * spec.Mpad + M, :S].set(
                geo.string_dom_rel[:, :, c].T)
        for fi, col in enumerate((0, 1, 4, 5, 6)):
            rel = rel.at[4 * spec.Mpad + fi, :S].set(feats[:, col])
    return walk, tilt_tab, acu_col, co_tab, bias_tab, wtab, sacu_col, sco, rel


def _build_pf(medium: MediumProperties, geo: DetectorGeometry,
              spectra: SpectrumTable, cfg: PropagationConfig):
    pf = jnp.zeros((PF_LEN,), jnp.float32)
    sets = {
        PF_Z_START: medium.layers_z_start,
        PF_LAYER_H: medium.layer_height,
        PF_ALPHA: medium.alpha, PF_KAPPA: medium.kappa,
        PF_ABS_A: medium.abs_A, PF_ABS_B: medium.abs_B,
        PF_ABS_D: medium.abs_D, PF_ABS_E: medium.abs_E,
        PF_MEAN_COS: medium.scattering.mean_cos,
        PF_LIU_FRAC: medium.scattering.liu_fraction,
        PF_R2: geo.collision_radius ** 2,
        PF_PANCAKE: cfg.pancake_factor,
        PF_MAX_SEG: cfg.max_segment_m,
        PF_HIST_T0: cfg.hist_t_min,
        PF_INV_HIST_DT: 1.0 / cfg.hist_dt,
        PF_BIAS_X0: spectra.bias_x[0],
        PF_BIAS_INV_DX: 1.0 / (spectra.bias_x[1] - spectra.bias_x[0]),
        PF_BIAS_XMAX: spectra.bias_x[-1],
        PF_DOM0_X: geo.dom_x[0], PF_DOM0_Y: geo.dom_y[0],
        PF_DOM0_Z: geo.dom_z[0],
        # shared DOM z-grid for uniform-z geometries (read only when
        # spec.uniform_z; harmless otherwise)
        PF_UZ_Z0: geo.string_features[0, 4],
        PF_UZ_DZ: jnp.where(geo.string_features[0, 5] != 0.0,
                            geo.string_features[0, 5], 1.0),
        PF_UZ_ND: geo.string_features[0, 7],
    }
    if medium.anisotropy.enabled:
        an = medium.anisotropy
        k1 = jnp.exp(an.mag_along)
        k2 = jnp.exp(an.mag_perp)
        sets.update({PF_AN_CA: jnp.cos(an.azimuth),
                     PF_AN_SA: jnp.sin(an.azimuth),
                     PF_AN_K1: k1, PF_AN_K2: k2,
                     PF_AN_KZ: 1.0 / (k1 * k2)})
    if medium.tilt.enabled:
        tl = medium.tilt
        if tl.distances.shape[0] > PF_WTAB_X0 - PF_TILT_D0:
            raise ValueError("tilt distance grid too large for the scalar "
                             "parameter vector")
        sets.update({PF_TILT_Z0: tl.first_z,
                     PF_TILT_INV_DZ: 1.0 / tl.z_spacing,
                     PF_TILT_CA: tl.azimuth_cos, PF_TILT_SA: tl.azimuth_sin})
        for j in range(tl.distances.shape[0]):
            sets[PF_TILT_D0 + j] = tl.distances[j]
    if medium.medium_kind != "icecube":
        sets[PF_WTAB_X0] = medium.water_wlen_first
        sets[PF_WTAB_INV_DX] = 1.0 / medium.water_wlen_step
    for i in range(5):
        sets[PF_N0 + i] = medium.ref_index.n[i]
        sets[PF_G0 + i] = medium.ref_index.g[i]
    idx = jnp.asarray(sorted(sets), jnp.int32)
    vals = jnp.stack([jnp.asarray(sets[i], jnp.float32)
                      for i in sorted(sets)])
    return pf.at[idx].set(vals)


@functools.lru_cache(maxsize=32)
def _make_call(spec: FusedSpec):
    RB = spec.block_lanes // LANES
    T = spec.iters_per_call
    nb = spec.n_blocks
    nsf = NSF + (NRSF if spec.records else 0)
    kernel = _make_kernel(spec)

    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    perblk = lambda rows: pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    pad8 = lambda v: -(-v // 8) * 8
    tilt_shape = ((pad8(2 * spec.nd_tilt), pad8(spec.nz_tilt - 1))
                  if spec.nz_tilt else (8, 8))
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),            # pf
        pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
        fixed((pad8(3 * (spec.K + 1)), spec.Lpad)),       # walk
        fixed(tilt_shape),                                # tilt
        fixed((spec.n_tables * pad8(spec.n_spec), 4)),    # acu
        fixed((8, spec.n_tables * pad8(spec.n_spec))),    # co
        fixed((8, pad8(spec.n_bias - 1))),                # bias
        fixed((16, pad8(spec.n_wtab - 1))
              if spec.medium_tables else (16, 8)),        # wtab
        fixed((pad8(spec.n_scat), 4)
              if spec.scat_table else (8, 4)),            # sacu
        fixed((8, pad8(spec.n_scat))
              if spec.scat_table else (8, 8)),            # sco
        fixed((sum(4 * p.K_cand for p in spec.sub_plans),
               max(p.n_cells for p in spec.sub_plans))
              if spec.sub_plans
              else (10 * spec.K_cand, spec.n_cull_cells)),  # cell
        fixed((8, spec.Spad) if spec.affine_doms
              else (4 * spec.Mpad + 8, spec.Spad)),       # rel
        perblk(NST * RB),                                 # steps
        perblk(nsf * RB),                                 # state
    ]
    if spec.external_uniforms:
        in_specs.append(perblk(T * 8 * RB))
    elif spec.threefry:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # (2T,) keys

    out_specs = [
        perblk(nsf * RB),                                 # state out
        perblk(spec.queue_rows),                          # qidx
        perblk(spec.queue_rows),                          # qw
        perblk(8),                                        # counters
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb * nsf * RB, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb * spec.queue_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb * spec.queue_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nb * 8, LANES), jnp.float32),
    ]
    if spec.records:
        out_specs.append(perblk(spec.queue_rows * NRQ))   # record queue
        out_shape.append(jax.ShapeDtypeStruct(
            (nb * spec.queue_rows * NRQ, LANES), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=spec.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def pack_state_arrays(fields, n_blocks, rb):
    """Stack per-lane (N,) field arrays into (n_blocks*F*rb, 128)."""
    F = len(fields)
    a = jnp.stack([jnp.asarray(f, jnp.float32) for f in fields])  # (F, N)
    a = a.reshape(F, n_blocks, rb, LANES).transpose(1, 0, 2, 3)
    return a.reshape(n_blocks * F * rb, LANES)


def unpack_state_array(packed, n_blocks, rb, n_fields):
    a = packed.reshape(n_blocks, n_fields, rb, LANES).transpose(1, 0, 2, 3)
    return a.reshape(n_fields, n_blocks * rb * LANES)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "spec", "max_calls", "scatter_cap", "repack",
                     "balance"))
def _run_fused(steps: StepBatch, medium: MediumProperties,
               geo: DetectorGeometry, spectra: SpectrumTable, seed,
               cfg: PropagationConfig, spec: FusedSpec,
               max_calls: int, scatter_cap: int, cell_tab=None,
               uniforms=None, repack: bool = False, balance: bool = True):
    nb = spec.n_blocks
    RB = spec.block_lanes // LANES
    call = _make_call(spec)
    tables = _build_tables(spec, medium, geo, spectra, cfg)
    pf = _build_pf(medium, geo, spectra, cfg)
    (walk, tilt_tab, acu_col, co_tab, bias_tab, wtab, sacu_col, sco,
     rel) = tables

    steps_packed = pack_state_arrays(
        [getattr(steps, f) for f in STEP_FIELDS], nb, RB)
    n = steps.x.shape[0]
    zf = jnp.zeros(n, jnp.float32)
    ones = jnp.ones(n, jnp.float32)
    init_fields = {
        "photons_left": steps.num_photons.astype(jnp.float32),
        "in_flight": zf, "x": zf, "y": zf, "z": zf, "t": zf,
        "dx": zf, "dy": zf, "dz": ones,
        "w0": zf,
        "inv_gv": jnp.full(n, 1.0 / 0.2, jnp.float32),
        "abs_left": zf,
        # benign finite coefficients for never-spawned lanes (keep the walk's
        # divisions finite; all uses are gated on in_flight)
        "gs": ones, "pa": zf, "qa": ones, "ra": zf,
        "pend_idx": zf, "pend_w": zf,
    }
    state0 = pack_state_arrays([init_fields[f] for f in STATE_FIELDS],
                               nb, RB)
    hist0 = jnp.zeros(geo.n_doms * cfg.hist_n_bins, jnp.float32)
    totals0 = jnp.zeros(7, jnp.float32)

    def one_call(call_no, steps_p, state):
        seed_arr = (jnp.full((1,), seed, jnp.int32)
                    + call_no.astype(jnp.int32) * 7919)
        args = [pf, seed_arr, walk, tilt_tab, acu_col, co_tab, bias_tab,
                wtab, sacu_col, sco, cell_tab, rel, steps_p, state]
        if spec.external_uniforms or spec.threefry:
            # threefry mode rides the same extra-input slot: `uniforms`
            # then carries the (2T,) folded per-iteration key table
            args.append(uniforms)
        return call(*args)

    def do_repack(steps_p, state):
        """Rebalance + stable-partition between kernel calls.

        Balance: the k-th busiest lane donates floor(photons_left/2) photons
        -- and a copy of its step parameters -- to the k-th drained lane, so
        slot-lifetime variance does not leave lanes idling while others grind
        through a deep queue (the load-leveling role of the reference's
        ascending-photon-count bunching, I3CLSimStepStore.h:163-220, made
        dynamic).  Photons of one step are i.i.d. given the step fields, so
        splitting a slot's remaining count across two lanes with independent
        RNG streams is distribution-identical.

        Partition: live lanes to the front so fully-drained blocks hit the
        kernel's per-block early exit."""
        st = unpack_state_array(state, nb, RB, NSF)       # (NSF, N)
        sp = unpack_state_array(steps_p, nb, RB, NST)     # (NST, N)
        left, inf, pend = st[0], st[1], st[NSF - 1]
        N = left.shape[0]
        iota = jnp.arange(N, dtype=jnp.int32)
        if balance:
            # O(N) rank pairing (no sorts): the k-th donor lane (left >= 2)
            # gives floor(left/2) photons + its step fields to the k-th
            # drained lane; sentinel index N + mode="drop" masks the tail
            dead = (left <= 0.5) & (inf <= 0.5) & (pend <= 0.0)
            donor_mask = left >= 2.0
            drank = jnp.cumsum(donor_mask.astype(jnp.int32)) - 1
            rrank = jnp.cumsum(dead.astype(jnp.int32)) - 1
            n_pairs = jnp.minimum(drank[-1], rrank[-1]) + 1
            sentinel = jnp.full(N, N, jnp.int32)
            donor_by_rank = sentinel.at[
                jnp.where(donor_mask, drank, N)].set(iota, mode="drop")
            recip_by_rank = sentinel.at[
                jnp.where(dead, rrank, N)].set(iota, mode="drop")
            valid = iota < n_pairs
            d_idx = jnp.where(valid, donor_by_rank, 0)
            r_idx = jnp.where(valid, recip_by_rank, 0)
            givev = jnp.where(valid, jnp.floor(left[d_idx] * 0.5), 0.0)
            left = left.at[d_idx].add(-givev)   # invalid pairs add 0 at lane 0
            left = left.at[r_idx].add(givev)
            st = st.at[0].set(left)
            moved = jnp.take(sp, d_idx, axis=1)           # (NST, N)
            sp = sp.at[:, jnp.where(valid, r_idx, N)].set(moved, mode="drop")
        # stable partition (live first) via rank scatter, again without sorts
        live = (left > 0.5) | (inf > 0.5) | (pend > 0.0)
        livei = live.astype(jnp.int32)
        n_live_inc = jnp.cumsum(livei)
        pos = jnp.where(live, n_live_inc - 1,
                        n_live_inc[-1] + jnp.cumsum(1 - livei) - 1)
        perm = jnp.zeros(N, jnp.int32).at[pos].set(iota)
        both = jnp.take(jnp.concatenate([st, sp], axis=0), perm, axis=1)
        return (pack_state_arrays(list(both[NSF:]), nb, RB),
                pack_state_arrays(list(both[:NSF]), nb, RB))

    # the alive-based stop condition needs the *last* call's alive count
    # (totals accumulates), so carry it separately
    def body2(carry):
        call_no, steps_p, state, hist, totals, _ = carry
        state, qidx, qw, cnt = one_call(call_no, steps_p, state)
        csum = jnp.sum(cnt[:, :7], axis=0)

        def deposit(h):
            idx = qidx.reshape(-1).astype(jnp.int32)
            w = qw.reshape(-1)
            return compact_scatter_add(h, idx, w, scatter_cap)

        # tail calls (drained blocks idling) queue nothing: skip the
        # top_k + scatter entirely
        hist = jax.lax.cond(csum[CNT_QUEUED] > 0.0, deposit,
                            lambda h: h, hist)
        totals = totals + csum
        if repack:
            steps_p, state = jax.lax.cond(
                (csum[CNT_ALIVE] > 0.0)
                & (csum[CNT_ALIVE] < 0.9 * float(steps.x.shape[0])),
                lambda a: do_repack(*a), lambda a: a, (steps_p, state))
        return (call_no + 1, steps_p, state, hist, totals, csum[CNT_ALIVE])

    def cond2(carry):
        call_no, _, _, _, _, alive = carry
        return ((call_no == 0) | (alive > 0.0)) & (call_no < max_calls)

    call_no, _, state, hist, totals, alive = jax.lax.while_loop(
        cond2, body2, (jnp.zeros((), jnp.int32), steps_packed, state0,
                       hist0, totals0, jnp.ones((), jnp.float32)))

    # CNT_ALIVE reports ABANDONED photons: slots still live when the
    # max_calls budget ran out (0 when the workload fully drained) -- the
    # "gave up vs drained" counter the round-1 review asked for.
    totals = totals.at[CNT_ALIVE].set(alive)
    return PropagationResult(
        hist=hist.reshape(geo.n_doms, cfg.hist_n_bins),
        n_generated=totals[CNT_GEN],
        n_hits=totals[CNT_HITS],
        weight_hits=totals[CNT_WSUM],
        n_iterations=call_no * spec.iters_per_call,
    ), totals


@functools.partial(jax.jit, static_argnames=("cfg", "spec"))
def _records_call(steps_p, state, medium, geo, spectra, seed_arr,
                  cfg, spec, cell_tab, uniforms=None):
    """One fused-kernel call in records mode (jitted; the call loop runs on
    the host so record chunks can be appended dynamically)."""
    (walk, tilt_tab, acu_col, co_tab, bias_tab, wtab, sacu_col, sco,
     rel) = _build_tables(spec, medium, geo, spectra, cfg)
    pf = _build_pf(medium, geo, spectra, cfg)
    args = [pf, seed_arr, walk, tilt_tab, acu_col, co_tab, bias_tab,
            wtab, sacu_col, sco, cell_tab, rel, steps_p, state]
    if spec.external_uniforms or spec.threefry:
        args.append(uniforms)
    return _make_call(spec)(*args)


def _run_fused_records(steps: StepBatch, medium, geo, spectra, seed,
                       cfg: PropagationConfig, spec: FusedSpec,
                       max_calls: int, cell_tab, uniforms=None):
    """Fused propagation with full photon records (cfg.save_photons): the
    per-call loop runs host-side, appending each call's compacted record
    queue -- records are unbounded across calls, unlike the fixed ring the
    engine keeps per slot.  Output matches the engine's record contract
    (rec dict + rec_count), shaped as one (1, N) ring so
    records_to_photon_batch / sample_mcpes consume it unchanged."""
    nb = spec.n_blocks
    RB = spec.block_lanes // LANES
    n = int(steps.x.shape[0])
    steps_packed = pack_state_arrays(
        [getattr(steps, f) for f in STEP_FIELDS], nb, RB)
    zf = jnp.zeros(n, jnp.float32)
    ones = jnp.ones(n, jnp.float32)
    init_fields = {
        "photons_left": steps.num_photons.astype(jnp.float32),
        "in_flight": zf, "x": zf, "y": zf, "z": zf, "t": zf,
        "dx": zf, "dy": zf, "dz": ones,
        "w0": zf,
        "inv_gv": jnp.full(n, 1.0 / 0.2, jnp.float32),
        "abs_left": zf,
        "gs": ones, "pa": zf, "qa": ones, "ra": zf,
        "pend_idx": zf, "pend_w": zf,
        # record-mode extras
        "wlen": jnp.full(n, 400.0, jnp.float32),
        "start_x": zf, "start_y": zf, "start_z": zf, "start_t": zf,
        "sdx": zf, "sdy": zf, "sdz": ones, "n_scat": zf,
        "abs_init": ones, "dist_abs": zf,
    }
    state = pack_state_arrays(
        [init_fields[f] for f in STATE_FIELDS + REC_STATE_FIELDS], nb, RB)
    nbins = cfg.hist_n_bins
    hist = np.zeros(geo.n_doms * nbins, np.float64)
    totals = np.zeros(7, np.float64)
    chunks = []
    calls = 0
    for call_no in range(max_calls):
        seed_arr = jnp.full((1,), int(seed) + call_no * 7919, jnp.int32)
        state, qidx, qw, cnt, qrec = _records_call(
            steps_packed, state, medium, geo, spectra, seed_arr,
            cfg, spec, cell_tab, uniforms=uniforms)
        calls += 1
        csum = np.asarray(cnt, np.float64)[:, :7].sum(axis=0)
        totals += csum
        qwn = np.asarray(qw, np.float64).reshape(-1)
        # hit entries carry w > 0 and feed the histogram; SAVE_ALL
        # absorption records ride the same queue with NEGATED weight and
        # are the only entries that become records in that mode
        pos = qwn > 0.0
        if pos.any():
            qin_all = np.asarray(qidx, np.float64).reshape(-1)
            np.add.at(hist, qin_all[pos].astype(np.int64), qwn[pos])
        valid = (qwn < 0.0) if spec.rec_all else pos
        if valid.any():
            qin = np.asarray(qidx, np.float64).reshape(-1)
            qrn = np.asarray(qrec, np.float64).reshape(
                nb, spec.queue_rows, NRQ, LANES)
            qrn = qrn.transpose(0, 1, 3, 2).reshape(-1, NRQ)
            chunks.append((qrn[valid], qin[valid], qwn[valid]))
        if csum[CNT_ALIVE] == 0.0:
            break
    totals[CNT_ALIVE] = csum[CNT_ALIVE]

    if chunks:
        raw = np.concatenate([c[0] for c in chunks], axis=0)
        qidx_all = np.concatenate([c[1] for c in chunks])
        w_all = np.concatenate([c[2] for c in chunks])
    else:
        raw = np.zeros((0, NRQ))
        qidx_all = np.zeros(0)
        w_all = np.zeros(0)
    f = {name: raw[:, k] for k, name in enumerate(REC_QUEUE_FIELDS)}
    dx_, dy_, dz_ = f["dir_x"], f["dir_y"], f["dir_z"]
    sdx_, sdy_, sdz_ = f["start_dx"], f["start_dy"], f["start_dz"]
    inv_gv = np.maximum(f["inv_gv"], 1e-20)
    one_row = lambda a: jnp.asarray(a, jnp.float32)[None, :]
    rec = {
        "pos_x": one_row(f["pos_x"]), "pos_y": one_row(f["pos_y"]),
        "pos_z": one_row(f["pos_z"]), "time": one_row(f["time"]),
        "dir_theta": one_row(np.arccos(np.clip(dz_, -1, 1))),
        "dir_phi": one_row(np.mod(np.arctan2(dy_, dx_), 2.0 * np.pi)),
        "wavelength": one_row(f["wavelength"]),
        "cherenkov_dist": one_row(
            (f["time"] - f["start_time"]) / inv_gv),
        "num_scatters": one_row(f["num_scatters"]),
        # absorption records (negated marker) keep the engine's weight-0
        # record convention; hit records keep their positive weight
        "weight": one_row(np.maximum(w_all, 0.0)),
        "identifier": one_row(f["identifier"]),
        "dom": one_row(np.floor(qidx_all / nbins)),
        "start_x": one_row(f["start_x"]), "start_y": one_row(f["start_y"]),
        "start_z": one_row(f["start_z"]),
        "start_time": one_row(f["start_time"]),
        "start_theta": one_row(np.arccos(np.clip(sdz_, -1, 1))),
        "start_phi": one_row(np.mod(np.arctan2(sdy_, sdx_),
                                    2.0 * np.pi)),
        "group_velocity": one_row(1.0 / inv_gv),
        "dist_in_abs_lens": one_row(f["dist_in_abs_lens"]),
    }
    res = PropagationResult(
        hist=jnp.asarray(hist.reshape(geo.n_doms, nbins), jnp.float32),
        n_generated=jnp.asarray(totals[CNT_GEN], jnp.float32),
        n_hits=jnp.asarray(totals[CNT_HITS], jnp.float32),
        weight_hits=jnp.asarray(totals[CNT_WSUM], jnp.float32),
        n_iterations=jnp.asarray(calls * spec.iters_per_call, jnp.int32),
        rec_count=jnp.asarray([raw.shape[0]], jnp.int32),
        rec=rec)
    return res, jnp.asarray(totals, jnp.float32)


def propagate_fused(steps: StepBatch, medium: MediumProperties,
                    geo: DetectorGeometry, spectra: SpectrumTable,
                    seed: int, cfg: PropagationConfig,
                    iters_per_call: int = 256,
                    flush_every: int = 16,
                    queue_rows: int = 32,
                    block_lanes: int = 4096,
                    splits: int = 2,
                    max_calls: int = 256,
                    scatter_cap: int = 8192,
                    spawn_every: int = 4,
                    repack: bool = True,
                    balance: bool = False,
                    uniforms=None,
                    threefry_key=None,
                    interpret: bool = False,
                    allow_uniform_replay: bool = False,
                    unroll: int = 1,
                    flush_rows: Optional[int] = None,
                    ablate: str = "") -> PropagationResult:
    """Drive the fused kernel until all photons are drained.

    `uniforms`: optional (T_total >= iters_per_call*max_calls, 8, n_slots)
    array of externally-supplied uniforms (parity-testing mode; implies the
    kernel consumes them instead of the on-core PRNG).

    `threefry_key`: optional (2,) uint32 jax PRNG key -- the kernel then
    draws its uniforms IN-KERNEL with counter-based threefry2x32,
    bit-exact to ops/rng's jax.random stream for that key (the engine run
    with the same key consumes identical values), with no materialized
    uniform array.  Requires max_calls=1 (the key table covers one call's
    iterations).

    Returns the same PropagationResult contract as engine.propagate (without
    photon records).  Extra diagnostics (dropped hits, queued counts) are
    attached as `.diagnostics` on the result's hist array holder -- use the
    second return of _run_fused for tests.
    """
    reason = fused_supported(medium, spectra, cfg)
    if reason:
        raise ValueError(f"fused path unsupported: {reason}")
    n = int(steps.x.shape[0])
    if n % block_lanes:
        raise ValueError(f"n_slots {n} must be a multiple of {block_lanes}")
    if iters_per_call % flush_every:
        raise ValueError("iters_per_call must be a multiple of flush_every")
    se_eff = (1 if (uniforms is not None or threefry_key is not None)
              else spawn_every)
    if flush_every % se_eff:
        raise ValueError("flush_every must be a multiple of spawn_every "
                         "(static spawn scheduling)")
    if (flush_every // se_eff) % unroll:
        raise ValueError("unroll must divide flush_every // spawn_every")
    if uniforms is not None and max_calls != 1 and not allow_uniform_replay:
        raise ValueError("external uniforms (parity mode) require "
                         "max_calls=1: each call would replay the same "
                         "uniform stream (pass allow_uniform_replay=True "
                         "for conservation tests where that is acceptable)")
    if threefry_key is not None:
        if uniforms is not None:
            raise ValueError("threefry_key and uniforms are exclusive")
        if max_calls != 1:
            raise ValueError("threefry_key requires max_calls=1 (the key "
                             "table covers one call's iterations)")
        if not jax.config.jax_threefry_partitionable:
            # the in-kernel threefry (_threefry_bits) reproduces
            # jax.random's PARTITIONABLE counter layout; with the old
            # non-partitionable layout the engine backward would consume a
            # divergent stream and the fit's shared-stream contract breaks
            # silently -- fail loudly instead
            raise RuntimeError(
                "threefry_key requires jax_threefry_partitionable=True "
                "(the in-kernel stream is bit-exact to jax.random's "
                "partitionable layout only); set "
                "jax.config.update('jax_threefry_partitionable', True)")
    cell_tab, plan = plan_collision(geo, cfg, ablate)
    spec = _build_spec(medium, geo, spectra, cfg, n, iters_per_call,
                       flush_every, queue_rows, block_lanes, splits,
                       uniforms is not None, interpret, ablate,
                       spawn_every=spawn_every, plan=plan, unroll=unroll,
                       flush_rows=flush_rows,
                       threefry=threefry_key is not None)
    if uniforms is not None:
        uniforms = _layout_uniforms(uniforms, spec)
    elif threefry_key is not None:
        # per-iteration folded keys, bit-identical to ops/rng.iter_key
        base = jnp.asarray(threefry_key, jnp.uint32)
        ks = jax.vmap(lambda t: jax.random.fold_in(base, t))(
            jnp.arange(iters_per_call))
        uniforms = jax.lax.bitcast_convert_type(
            ks.reshape(-1), jnp.int32)          # (2T,) SMEM key table
    # seed stays traced when propagate_auto runs under an outer jit (the
    # production entry path); the records driver loops host-side and needs
    # a concrete one
    seed = seed if isinstance(seed, jax.core.Tracer) else int(seed)
    if spec.records:
        res, totals = _run_fused_records(
            steps, medium, geo, spectra, seed, cfg, spec, max_calls,
            cell_tab=jnp.asarray(cell_tab), uniforms=uniforms)
    else:
        res, totals = _run_fused(steps, medium, geo, spectra, seed,
                                 cfg, spec, max_calls, scatter_cap,
                                 cell_tab=jnp.asarray(cell_tab),
                                 uniforms=uniforms,
                                 repack=repack and (uniforms is None
                                                    or allow_uniform_replay),
                                 balance=balance)
    return res, totals


def _layout_uniforms(uniforms, spec: FusedSpec):
    """(T, 8, N) -> packed (nb * T*8*RB, 128) matching the kernel reads."""
    T = spec.iters_per_call
    RB = spec.block_lanes // LANES
    u = jnp.asarray(uniforms, jnp.float32)
    if u.shape[0] < T:
        raise ValueError(f"need >= {T} iterations of uniforms")
    u = u[:T]                                       # (T, 8, N)
    u = u.reshape(T, 8, spec.n_blocks, RB, LANES)
    u = u.transpose(2, 0, 1, 3, 4)                  # (nb, T, 8, RB, 128)
    return u.reshape(spec.n_blocks * T * 8 * RB, LANES)
