'''
Pallas TPU kernel for the exhaustive scan: fused match + mode gating +
statistics reduction in VMEM.

The XLA formulation (kvarq_tpu.engine.tensor_scan) materializes the
``[B, Q]`` match-count tensor in HBM and streams it through half a dozen
elementwise consumers -- at genome-scale Q that traffic costs ~8x the
matmul itself.  This kernel computes a ``[TB, TQ]`` match tile on the MXU
and immediately gates + reduces it on the VPU without leaving VMEM:

- per-column partials ``w_q``/``wov_q`` (hit counts / overlap-base sums
  per bank shift column) accumulate across the read-block grid axis;
- per-read hit totals are emitted as ``[8*nQ, B]`` partials (each grid
  step owns one block -- no non-consecutive output revisits) and reduced
  by XLA.

Reads and bank are matched as **bf16 one-hot on the MXU** -- match
counts are small integers (<= Lpad), exact in f32 accumulation, and cast
losslessly to int32 for the all-integer mode gating on the VPU.  (An
int8/int32 formulation was measured ~1.8x *slower*: Mosaic does not
lower int8 dots to the v5e MXU's int8 mode.)  When the bank contains no
``N`` the one-hot narrows to 4 channels: a read ``N`` then one-hots to
the zero vector and mismatches everywhere, which is exact since nothing
in the bank could match it -- a 20% FLOP cut on N-free banks (the norm).

Coverage accumulation (the second MXU contraction) is NOT in the kernel:
hits are sparse in real FastQs, so :py:func:`scan_step_banked` compacts
the hitting reads (using the per-read totals) and runs the small
``[k, Q]`` recompute + scatter as plain XLA matmuls (5-channel there --
coverage must count read ``N`` bases).

Replicates the reference hot loop semantics (workhorse.c:1107-1174) via
the shared mode-weight formulas in kvarq_tpu.engine.tensor_scan; output is
bit-identical to the XLA and numpy matchers (exact integer counts).
'''

import functools

import numpy as np

from kvarq_tpu.engine import encode

# q-metadata row indices in the packed [8, Qp] int32 array.  Rows 3-6
# are kernel-side precomputations: MXD = max(0, d) (set to a huge value
# on invalid/padded columns so their overlap length goes very negative
# and every mode fails arithmetically), SD = seql - d (so the mode-B
# border test t1 >= seql becomes the outer compare rl >= SD), CA/CB =
# the per-column parts of the mode-A/B gates
# (valid & seql > minoverlap & d <0 / >0).
ROW_D, ROW_SEQL, ROW_VALID = 0, 1, 2
ROW_MXD, ROW_SD, ROW_CA, ROW_CB = 3, 4, 5, 6
INVALID_MXD = 1 << 20

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
    mo = bank.minoverlap if bank.minoverlap is not None else 0
    if Qp is None:
        Qp = max(_ceil_to(Q, TQ), TQ)
    qmeta = np.zeros((8, Qp), dtype=np.int32)
    qmeta[ROW_SEQL, :] = 1
    qmeta[ROW_D, :Q] = bank.d_of
    qmeta[ROW_SEQL, :Q] = bank.seql_of
    valid = np.zeros(Qp, dtype=bool)
    valid[:Q] = bank.tid >= 0
    qmeta[ROW_VALID] = valid
    # kernel-side precomputations: on invalid columns MXD is huge, which
    # drives the overlap length far negative so no mode can fire there
    # (the in-kernel gating then needs no explicit `valid` term)
    qmeta[ROW_MXD] = np.where(valid, np.maximum(0, qmeta[ROW_D]),
                              INVALID_MXD)
    qmeta[ROW_SD] = qmeta[ROW_SEQL] - qmeta[ROW_D]
    ab_col = valid & (qmeta[ROW_SEQL] > mo)
    qmeta[ROW_CA] = ab_col & (qmeta[ROW_D] < 0)
    qmeta[ROW_CB] = ab_col & (qmeta[ROW_D] > 0)
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
        zero past the real Q -- padded columns carry valid=0 and never
        pass.  bf16 for the MXU; ``nch`` channels (see
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


def _match_kernel(maxerrors, minoverlap,
                  read_ref, rl_ref, k_ref, qmeta_ref,
                  stats_ref, hit_ref):
    ''' one (q-block, b-block) grid step; see module docstring '''
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    b = pl.program_id(1)
    TQ_ = stats_ref.shape[1]
    TB_ = hit_ref.shape[1]

    # bf16 x bf16 -> f32 on the MXU; one-hot match counts are small
    # integers (<= Lpad), exact in f32, and cast losslessly to i32 for
    # the all-integer gating below
    matches = jnp.dot(read_ref[:], k_ref[:],
                      preferred_element_type=jnp.float32
                      ).astype(jnp.int32)                    # [TB, TQ] i32

    rl = rl_ref[:, 0:1]                                      # [TB, 1] i32
    d = qmeta_ref[ROW_D:ROW_D + 1, :]                        # [1, TQ] i32
    seql = qmeta_ref[ROW_SEQL:ROW_SEQL + 1, :]
    mxd = qmeta_ref[ROW_MXD:ROW_MXD + 1, :]
    sd = qmeta_ref[ROW_SD:ROW_SD + 1, :]
    ca = qmeta_ref[ROW_CA:ROW_CA + 1, :]
    cb = qmeta_ref[ROW_CB:ROW_CB + 1, :]
    mo = minoverlap

    # reduced mode gating (see tensor_scan.mode_weights for the algebra;
    # exhaustively verified equivalent to the four-window enumeration).
    # Per-column invariants (max(0,d), seql-d, the mode-A/B column gates)
    # come precomputed in qmeta; invalid/padded columns carry
    # MXD = 2^20, which drives the overlap length so negative that every
    # mode fails arithmetically -- no explicit `valid` term needed.
    ov = jnp.minimum(seql, d + rl) - mxd                     # [TB, TQ] i32
    govmo = ov >= mo
    full = ov == jnp.minimum(rl, seql)
    hit = ov - matches <= maxerrors
    abg = (rl > mo) & govmo
    wA = abg & (ca > 0) & (ov != seql)
    wB = abg & (cb > 0) & (rl >= sd)
    nmodes = (wA.astype(jnp.int32) + wB.astype(jnp.int32)
              + full.astype(jnp.int32))
    w = jnp.where(hit & (rl > 0), nmodes, 0)                 # [TB, TQ] i32

    part = jnp.concatenate(
        [jnp.sum(w, axis=0, keepdims=True),
         jnp.sum(w * ov, axis=0, keepdims=True),
         jnp.zeros((6, TQ_), jnp.int32)], axis=0)            # [8, TQ]

    @pl.when(b == 0)
    def _():
        stats_ref[:] = part

    @pl.when(b > 0)
    def _():
        stats_ref[:] = stats_ref[:] + part

    # per-read totals for this q block: rows 1..7 stay zero
    wb = jnp.sum(w, axis=1, keepdims=True)                   # [TB, 1]
    hit_ref[:] = jnp.pad(wb.T, ((0, 7), (0, 0)))             # [8, TB]


@functools.lru_cache(maxsize=None)
def match_stats_call(Lpad, Qp, B, maxerrors, minoverlap,
                     TB=DEF_TB, TQ=DEF_TQ, interpret=False, nch=encode.NBASE):
    '''
    :returns: jit-able ``f(read_flat [B, Lpad*nch] bf16, rl2d [B, 128] i32,
        K [Lpad*nch, Qp] bf16, qmeta [8, Qp] i32) -> (stats [8, Qp] i32,
        hitpart [8*nQ, B] i32)`` where stats row 0 = w_q, row 1 = wov_q,
        and ``hitpart.sum(axis=0)[b]`` = total hit weight of read b
    '''
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert B % TB == 0 and Qp % TQ == 0
    nB, nQ = B // TB, Qp // TQ
    L5 = Lpad * nch

    kernel = functools.partial(_match_kernel, maxerrors, minoverlap)

    grid_spec = pl.GridSpec(
        grid=(nQ, nB),    # b innermost: stats blocks revisit consecutively
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
            pl.BlockSpec((8, TQ), lambda q, b: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TB), lambda q, b: (q, b),
                         memory_space=pltpu.VMEM),
        ],
    )

    def call(read_flat, rl2d, K, qmeta):
        import jax.numpy as jnp
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((8, Qp), jnp.int32),
                jax.ShapeDtypeStruct((8 * nQ, B), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * L5 * Qp,
                bytes_accessed=(B * L5 * 2) * nQ + L5 * Qp * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(read_flat, rl2d, K, qmeta)

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
              gather_k=1024, interpret=False, TB=DEF_TB, TQ=DEF_TQ):
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

    Statistics come from the fused kernel; coverage comes from a second
    pass restricted to the (compacted, sparse) hitting reads, with a
    ``lax.cond`` fallback to the all-reads contraction when more than
    ``gather_k`` reads hit.
    '''
    qmeta_np = pack_qmeta(bank, TQ)
    tseg_np = pack_tseg(bank, T, TQ)
    inner = scan_step_banked(Lpad, bank.G, qmeta_np.shape[1], T,
                             maxerrors, minoverlap, B, gather_k,
                             interpret, TB, TQ,
                             nch=bank_channels(bank.codes))

    def step(codes, rl, K, qmeta):
        import jax.numpy as jnp
        return inner(codes, rl, K, qmeta, jnp.asarray(tseg_np))

    return step


def scan_step_banked(Lpad, G, Qp, T, maxerrors, minoverlap, B,
                     gather_k=1024, interpret=False, TB=DEF_TB,
                     TQ=DEF_TQ, nch=encode.NBASE):
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

    kcall = match_stats_call(Lpad, Qp, Bp, maxerrors, minoverlap,
                             TB, TQ, interpret, nch)
    gather_k = min(gather_k, Bp)

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
        rl2d = jnp.broadcast_to(rl[:, None], (Bp, 128))

        stats, hitpart = kcall(read_flat, rl2d, K, qmeta)
        w_q, wov_q = stats[0], stats[1]
        seqhits = jax.ops.segment_sum(w_q, tseg, num_segments=T + 1)
        seqbasehits = jax.ops.segment_sum(wov_q, tseg, num_segments=T + 1)

        # coverage over compacted hitting reads (sparse in real data);
        # this pass one-hots the full 5 channels -- read N bases count as
        # coverage + mutations -- against K's nch channels for matching
        meta = (qmeta[ROW_D:ROW_D + 1], qmeta[ROW_SEQL:ROW_SEQL + 1],
                qmeta[ROW_VALID:ROW_VALID + 1])
        hit_b = jnp.sum(hitpart, axis=0)                     # [Bp]
        count = jnp.sum((hit_b > 0).astype(jnp.int32))
        (idx,) = jnp.nonzero(hit_b > 0, size=gather_k, fill_value=0)
        fill = (jnp.arange(gather_k) < count)
        rg = read_flat[idx] * fill[:, None].astype(jnp.bfloat16)
        rg5 = jax.nn.one_hot(codes[idx], encode.NBASE, dtype=jnp.bfloat16) \
            .reshape(gather_k, Lpad * encode.NBASE) \
            * fill[:, None].astype(jnp.bfloat16)
        rlg = (rl[idx] * fill)[:, None]

        def rtw_gathered(_):
            m = jnp.dot(rg, K, preferred_element_type=jnp.float32)
            w, _ = mode_weights(m, rlg, *meta, maxerrors, minoverlap)
            return jnp.dot(rg5.T, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        def rtw_full(_):
            m = jnp.dot(read_flat, K, preferred_element_type=jnp.float32)
            w, _ = mode_weights(m, rl[:, None], *meta,
                                maxerrors, minoverlap)
            read5 = jax.nn.one_hot(codes, encode.NBASE, dtype=jnp.bfloat16) \
                .reshape(Bp, Lpad * encode.NBASE)
            return jnp.dot(read5.T, w.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        RTw = lax.cond(count <= gather_k, rtw_gathered, rtw_full, None)
        return fold(RTw).astype(jnp.float32), seqhits, seqbasehits

    return step
