'''
Pallas TPU kernel for the exhaustive scan: fused match + candidate
detection in VMEM, with exact statistics/coverage computed over the
(sparse) candidate reads outside the kernel.

The XLA formulation (kvarq_tpu.engine.tensor_scan) materializes the
``[B, Q]`` match-count tensor in HBM and streams it through half a dozen
elementwise consumers -- at genome-scale Q that traffic costs ~8x the
matmul itself.  This kernel computes a ``[TB, TQ]`` match tile on the MXU
and immediately screens it on the VPU without leaving VMEM.

**Design: the kernel is a candidate detector, not a scorer.**  Round-2
profiling showed the full in-kernel mode gating (~22 VPU ops/element)
costing ~3x the MXU contraction (42.6 vs 136 TFLOP/s, BASELINE.md) -- on
a VPU, per-element gating rivals a 512-MAC matmul column.  But exact
per-mode weights are only needed for reads that can hit at all, and those
are rare (a few kbp of targets vs megabases of reads).  So the kernel
now evaluates one sound candidate predicate per element

    cand' = matches >= max(ov, tau) - maxerrors

with ``ov = min(rl + dm, ovc)`` (from precomputed per-column
``dm = min(d, 0)``, ``ovc = seql - max(0, d)``) and the threshold
``tau = min(minoverlap, rl, seql)``.  Soundness: any reference hit mode
requires either overlap >= minoverlap (modes A/B) or full containment
``ov == min(rl, seql)`` (modes C/D, which have *no* minoverlap bound);
since ``ov <= min(rl, seql)`` always, both cases are exactly
``ov >= tau`` together with ``ov - matches <= maxerrors`` -- and that
exact predicate implies ``max(ov, tau) = ov``, so cand' is a superset.
The relaxation (flagging ``ov < tau`` when ``matches >= tau - e``)
admits only near-perfect sub-threshold overlaps -- vanishing on real
data -- and flagged reads are re-scored exactly anyway.  Padded rows
get an infinite row threshold (rl == 0), padded/gap columns an ``ovc``
of -2^20 and an infinite ``tau`` (their K columns are all-zero, so
``matches == 0``).  5-6 VPU ops/element all in f32 (thresholds are
integers < 2^21, exact in f32 -- no i32 cast of the match tile),
emitted as per-read flag-count partials ``[8*nQ, B]``.

The flagged reads (true hits plus a vanishing number of near-miss false
positives -- a random 25-mer overlap passes only with >= 23/25 identity)
are then compacted by :py:func:`scan_step_banked` and re-scored *exactly*
with the shared :py:func:`kvarq_tpu.engine.tensor_scan.mode_weights` on a
small ``[gather_k, Q]`` recompute, which yields the per-template
seqhits/seqbasehits statistics AND the coverage contraction in one place
(a ``lax.cond`` falls back to the all-reads contraction when more than
``gather_k`` reads flag, e.g. on hit-dense test fixtures).  Output is
bit-identical to the XLA and numpy matchers (exact integer counts);
tests/test_pallas_scan.py asserts it.

Reads and bank are matched as **bf16 one-hot on the MXU** -- match
counts are small integers (<= Lpad), exact in f32 accumulation, and cast
losslessly to int32 for the all-integer screen on the VPU.  (An
int8/int32 formulation was measured ~1.8x *slower*: Mosaic does not
lower int8 dots to the v5e MXU's int8 mode.)  When the bank contains no
``N`` the one-hot narrows to 4 channels: a read ``N`` then one-hots to
the zero vector and mismatches everywhere, which is exact since nothing
in the bank could match it -- a 20% FLOP cut on N-free banks (the norm).

Replicates the reference hot loop semantics (workhorse.c:1107-1174) via
the shared mode-weight formulas in kvarq_tpu.engine.tensor_scan.
'''

import functools

import numpy as np

from kvarq_tpu.engine import encode

# q-metadata row indices in the packed [8, Qp] int32 array.  Rows 0-2
# feed the exact mode_weights recompute outside the kernel; rows 3-4 are
# the kernel-side candidate-screen precomputations:
# DM = min(d, 0) (the read-side offset of the overlap window) and
# OVC = seql - max(0, d) (the column part of the overlap length), set to
# -2^20 on invalid/padded columns so the overlap goes so negative that
# the screen can never pass there.
ROW_D, ROW_SEQL, ROW_VALID = 0, 1, 2
ROW_DM, ROW_OVC = 3, 4
INVALID_OVC = -(1 << 20)
BIG_RL_THRESHOLD = 1 << 20

# tuned on v5e (see tools/tune log in git history): throughput is mostly
# set by the per-call batch size; tiles matter little beyond alignment
DEF_TB = 512
DEF_TQ = 2048


def _ceil_to(x, m):
    return -(-x // m) * m


def bank_channels(bank_codes):
    ''' one-hot channels needed to match this bank exactly: 4 (ACGT) when
        the bank is N-free -- read N one-hots to zero and thus mismatches,
        which is exact since nothing in the bank could match it -- else
        the full 5 '''
    return encode.NBASE if (np.asarray(bank_codes) == encode.N).any() \
        else encode.NBASE - 1


def pack_qmeta(bank, TQ=DEF_TQ, Qp=None):
    ''' pack per-shift-column metadata into one sublane-aligned [8, Qp]
        int32 array (rows: see the ROW_* constants) '''
    Q = bank.Q
    if Qp is None:
        Qp = max(_ceil_to(Q, TQ), TQ)
    qmeta = np.zeros((8, Qp), dtype=np.int32)
    qmeta[ROW_SEQL, :] = 1
    qmeta[ROW_D, :Q] = bank.d_of
    qmeta[ROW_SEQL, :Q] = bank.seql_of
    valid = np.zeros(Qp, dtype=bool)
    valid[:Q] = bank.tid >= 0
    qmeta[ROW_VALID] = valid
    # kernel-side candidate-screen precomputations (see module docstring)
    qmeta[ROW_DM] = np.where(valid, np.minimum(0, qmeta[ROW_D]), 0)
    qmeta[ROW_OVC] = np.where(
        valid, qmeta[ROW_SEQL] - np.maximum(0, qmeta[ROW_D]), INVALID_OVC)
    return qmeta


def pack_tseg(bank, T, TQ=DEF_TQ, Qp=None):
    ''' Q -> template-id segment map padded to Qp (invalid columns map to
        the discard segment T) '''
    if Qp is None:
        Qp = max(_ceil_to(bank.Q, TQ), TQ)
    tseg = np.full(Qp, T, dtype=np.int32)
    tseg[:bank.Q] = np.where(bank.tid >= 0, bank.tid, T)
    return tseg


def build_K_np(bank_codes, Lpad, Qp, nch=None):
    ''' im2col'd one-hot bank: K[(j,c), q] = onehot(bank[q-(Lpad-1)+j])[c],
        zero past the real Q -- padded columns carry OVC=-2^20 and can
        never flag.  bf16 for the MXU; ``nch`` channels (see
        :py:func:`bank_channels`).  Built on host: doing the Lpad slices
        inside a jit graph costs minutes of (remote) compile time for zero
        runtime benefit since K is computed once per bank. '''
    import ml_dtypes
    if nch is None:
        nch = bank_channels(bank_codes)
    G = len(bank_codes)
    oh = np.zeros((nch, G + 2 * (Lpad - 1) + (Qp - G - Lpad + 1)),
                  dtype=np.float32)
    for c in range(nch):
        oh[c, Lpad - 1:Lpad - 1 + G] = (bank_codes == c)
    K = np.empty((Lpad, nch, Qp), dtype=np.float32)
    for j in range(Lpad):
        K[j] = oh[:, j:j + Qp]
    return K.reshape(Lpad * nch, Qp).astype(ml_dtypes.bfloat16)


def _cand_kernel(maxerrors, minoverlap,
                 read_ref, rl_ref, k_ref, qmeta_ref, hit_ref):
    ''' one (q-block, b-block) grid step; see module docstring '''
    import jax.numpy as jnp

    # bf16 x bf16 -> f32 on the MXU; one-hot match counts are small
    # integers (<= Lpad), exact in f32.  The screen stays in f32 too:
    # every threshold below is an integer of magnitude < 2^21, exactly
    # representable, so f32 compares are exact and the [TB, TQ] i32
    # cast is saved.
    matches = jnp.dot(read_ref[:], k_ref[:],
                      preferred_element_type=jnp.float32)    # [TB, TQ] f32

    rl = rl_ref[:, 0:1]                                      # [TB, 1] i32
    dm = qmeta_ref[ROW_DM:ROW_DM + 1, :]                     # [1, TQ] i32
    ovc = qmeta_ref[ROW_OVC:ROW_OVC + 1, :]
    seql = qmeta_ref[ROW_SEQL:ROW_SEQL + 1, :]
    valid = qmeta_ref[ROW_VALID:ROW_VALID + 1, :]

    # row/column pieces, with maxerrors folded in -- [TB, 1] / [1, TQ]
    # ops are ~free next to the [TB, TQ] elementwise work
    rlmo_e = (jnp.where(rl > 0, jnp.minimum(rl, minoverlap),
                        BIG_RL_THRESHOLD) - maxerrors).astype(jnp.float32)
    dm_e = (dm - maxerrors).astype(jnp.float32)
    ovc_e = (ovc - maxerrors).astype(jnp.float32)  # -2^20 on padded cols
    # invalid/padded columns must keep an unreachable threshold: their
    # K columns are all-zero (matches == 0), so force tau there
    seql_e = jnp.where(valid > 0, (seql - maxerrors).astype(jnp.float32),
                       float(BIG_RL_THRESHOLD))

    # sound candidate screen, 5 elementwise ops (see module docstring):
    #   cand' = matches >= max(ov, tau) - e
    #         = matches >= max(min(rl + dm - e, ovc - e),
    #                          min(rl, mo, seql) - e)
    # with ov = min(rl + dm, ovc) and tau = min(mo, rl, seql).  The
    # exact predicate is (ov - matches <= e) & (ov >= tau); since
    # ov >= tau implies max(ov, tau) = ov, cand' is a superset -- the
    # extra band (ov < tau, matches >= tau - e <= ov) needs >= (tau-e)
    # matching bases inside an overlap shorter than tau, vanishing for
    # real data -- and every flagged read is re-scored exactly outside
    # the kernel, so output bits are unchanged.
    ov_e = jnp.minimum(rl.astype(jnp.float32) + dm_e, ovc_e)
    tau_e = jnp.minimum(rlmo_e, seql_e)
    cand = matches >= jnp.maximum(ov_e, tau_e)

    # per-read candidate-column counts for this q block; rows 1..7 zero
    nb = jnp.sum(cand.astype(jnp.int32), axis=1, keepdims=True)  # [TB, 1]
    hit_ref[:] = jnp.pad(nb.T, ((0, 7), (0, 0)))             # [8, TB]


@functools.lru_cache(maxsize=None)
def match_cand_call(Lpad, Qp, B, maxerrors, minoverlap,
                    TB=DEF_TB, TQ=DEF_TQ, interpret=False, nch=encode.NBASE,
                    vma=None):
    '''
    :returns: jit-able ``f(read_flat [B, Lpad*nch] bf16, rl2d [B, 128] i32,
        K [Lpad*nch, Qp] bf16, qmeta [8, Qp] i32) -> hitpart [8*nQ, B]
        i32`` where ``hitpart.sum(axis=0)[b] > 0`` iff read b is a
        candidate (a sound superset of the reads with any hit).

    ``vma`` (a tuple of mesh axis names, or None) declares which mesh
    axes the output varies over when the call runs inside a
    ``shard_map(check_vma=True)`` region (kvarq_tpu.parallel) -- pallas
    outputs carry no inferred varying-mesh-axes annotation, so it must
    be stated explicitly.
    '''
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert B % TB == 0 and Qp % TQ == 0
    nB, nQ = B // TB, Qp // TQ
    L5 = Lpad * nch

    kernel = functools.partial(_cand_kernel, maxerrors, minoverlap)

    grid_spec = pl.GridSpec(
        grid=(nQ, nB),
        in_specs=[
            pl.BlockSpec((TB, L5), lambda q, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda q, b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L5, TQ), lambda q, b: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TQ), lambda q, b: (0, q),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TB), lambda q, b: (q, b),
                         memory_space=pltpu.VMEM),
        ],
    )

    def call(read_flat, rl2d, K, qmeta):
        import jax.numpy as jnp
        out_sds = (jax.ShapeDtypeStruct((8 * nQ, B), jnp.int32)
                   if vma is None else
                   jax.ShapeDtypeStruct((8 * nQ, B), jnp.int32,
                                        vma=frozenset(vma)))
        (hitpart,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[out_sds],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * L5 * Qp,
                bytes_accessed=(B * L5 * 2) * nQ + L5 * Qp * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(read_flat, rl2d, K, qmeta)
        return hitpart

    return call


def device_arrays(bank, TQ=DEF_TQ):
    ''' device-resident bank data for :py:func:`scan_step`: the im2col'd
        bf16 K matrix and packed q metadata '''
    import jax
    import jax.numpy as jnp
    qmeta = pack_qmeta(bank, TQ)
    Qp = qmeta.shape[1]
    K = jax.device_put(build_K_np(bank.codes, bank.Lpad, Qp))
    return dict(K=K, qmeta=jnp.asarray(qmeta))


def scan_step(Lpad, bank, T, maxerrors, minoverlap, B,
              gather_k=768, interpret=False, TB=DEF_TB, TQ=DEF_TQ,
              with_count=False):
    '''
    full Pallas-backed scan step with the same contract as
    tensor_scan.scan_step_fn: ``step(codes [B, Lpad] u8, rl [B] i32,
    K, qmeta) -> (basecount [5, G] f32, seqhits [T+1] i32,
    seqbasehits [T+1] i32)``.

    The diagonal fold stays inside the jit graph: a host-side fold would
    need the unfolded ``[Lpad*5, Qp]`` contraction (~100 MB) as the
    device accumulator, and donating buffers that large round-trips
    through the host on relayed TPU attachments (measured ~100x slower
    steps).

    The kernel flags candidate reads; statistics AND coverage come from a
    second pass restricted to the (compacted, sparse) candidates, with a
    ``lax.cond`` fallback to the all-reads contraction when more than
    ``gather_k`` reads flag.
    '''
    qmeta_np = pack_qmeta(bank, TQ)
    tseg_np = pack_tseg(bank, T, TQ)
    inner = scan_step_banked(Lpad, bank.G, qmeta_np.shape[1], T,
                             maxerrors, minoverlap, B, gather_k,
                             interpret, TB, TQ,
                             nch=bank_channels(bank.codes),
                             with_count=with_count)

    def step(codes, rl, K, qmeta):
        import jax.numpy as jnp
        return inner(codes, rl, K, qmeta, jnp.asarray(tseg_np))

    return step


def scan_step_banked(Lpad, G, Qp, T, maxerrors, minoverlap, B,
                     gather_k=768, interpret=False, TB=DEF_TB,
                     TQ=DEF_TQ, nch=encode.NBASE, vma=None,
                     with_count=False):
    '''
    bank-agnostic variant of :py:func:`scan_step`: all bank data (K,
    qmeta, tseg) are runtime arguments, so the same traced program can
    run on different (equally-shaped) per-shard sub-banks under
    ``shard_map`` (kvarq_tpu.parallel).  ``nch`` must match the channel
    count K was built with (:py:func:`bank_channels`).
    '''
    import jax
    import jax.numpy as jnp
    from jax import lax
    from kvarq_tpu.engine.tensor_scan import mode_weights

    Bp = max(_ceil_to(B, TB), TB)

    # dense mode (gather_k 0/None): hit-dense workloads where virtually
    # every read is a candidate -- the screening kernel and the
    # compaction are pure overhead there, so the step is just the exact
    # full-batch scoring pass.  TensorScanner switches here terminally
    # when the observed candidate count overflows every gather bucket.
    dense = not gather_k or gather_k >= Bp
    kcall = None if dense else match_cand_call(
        Lpad, Qp, Bp, maxerrors, minoverlap, TB, TQ, interpret, nch, vma)
    gather_k = min(gather_k or Bp, Bp)

    def fold(RTw):
        RTw = RTw.reshape(Lpad, encode.NBASE, Qp)
        return sum(RTw[j, :, Lpad - 1 - j:Lpad - 1 - j + G]
                   for j in range(Lpad))                     # [5, G]

    def step(codes, rl, K, qmeta, tseg):
        read_flat = jax.nn.one_hot(codes, nch,
                                   dtype=jnp.bfloat16).reshape(-1, Lpad * nch)
        rl = rl.astype(jnp.int32)
        if Bp != B:
            read_flat = jnp.pad(read_flat, ((0, Bp - B), (0, 0)))
            rl = jnp.pad(rl, (0, Bp - B))
            codes = jnp.pad(codes, ((0, Bp - B), (0, 0)),
                            constant_values=encode.CODE_READ_JUNK)
        # exact stats + coverage over the compacted candidate reads
        # (sparse in real data); the coverage pass one-hots the full 5
        # channels -- read N bases count as coverage + mutations --
        # against K's nch channels for matching
        meta = (qmeta[ROW_D:ROW_D + 1], qmeta[ROW_SEQL:ROW_SEQL + 1],
                qmeta[ROW_VALID:ROW_VALID + 1])

        def score_full(_):
            m = jnp.dot(read_flat, K, preferred_element_type=jnp.float32)
            w, ov = mode_weights(m, rl[:, None], *meta,
                                 maxerrors, minoverlap)
            read5 = jax.nn.one_hot(codes, encode.NBASE, dtype=jnp.bfloat16) \
                .reshape(Bp, Lpad * encode.NBASE)
            RTw = jnp.dot(read5.T, w.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            return RTw, jnp.sum(w, axis=0), jnp.sum(w * ov, axis=0)

        if dense:
            count = jnp.zeros((), dtype=jnp.int32)
            RTw, w_q, wov_q = score_full(None)
        else:
            rl2d = jnp.broadcast_to(rl[:, None], (Bp, 128))
            hitpart = kcall(read_flat, rl2d, K, qmeta)
            hit_b = jnp.sum(hitpart, axis=0)                 # [Bp]
            count = jnp.sum((hit_b > 0).astype(jnp.int32))
            (idx,) = jnp.nonzero(hit_b > 0, size=gather_k, fill_value=0)
            fill = (jnp.arange(gather_k) < count)
            rg = read_flat[idx] * fill[:, None].astype(jnp.bfloat16)
            rg5 = jax.nn.one_hot(codes[idx], encode.NBASE,
                                 dtype=jnp.bfloat16) \
                .reshape(gather_k, Lpad * encode.NBASE) \
                * fill[:, None].astype(jnp.bfloat16)
            rlg = (rl[idx] * fill)[:, None]

            def score_gathered(_):
                m = jnp.dot(rg, K, preferred_element_type=jnp.float32)
                w, ov = mode_weights(m, rlg, *meta, maxerrors,
                                     minoverlap)
                RTw = jnp.dot(rg5.T, w.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                return RTw, jnp.sum(w, axis=0), jnp.sum(w * ov, axis=0)

            RTw, w_q, wov_q = lax.cond(count <= gather_k,
                                       score_gathered, score_full, None)
        seqhits = jax.ops.segment_sum(w_q, tseg, num_segments=T + 1)
        seqbasehits = jax.ops.segment_sum(wov_q, tseg, num_segments=T + 1)
        bc = fold(RTw).astype(jnp.float32)
        if with_count:
            # per-dispatch candidate count: drives TensorScanner's
            # adaptive gather_k (piggybacked on the accumulator flush,
            # zero extra round trips)
            return bc, seqhits, seqbasehits, count
        return bc, seqhits, seqbasehits

    return step
