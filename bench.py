#!/usr/bin/env python
'''
Headline benchmark: reads/second scanning a synthetic Illumina-like FastQ
against the full MTBC testsuites (phylo + resistance + spoligo, 131
templates x 2 strands), measured on the default JAX device.

Prints ONE json line:
    {"metric": "scan_reads_per_s", "value": N, "unit": "reads/s",
     "vs_baseline": R}

``vs_baseline`` is measured against the reference C engine's throughput on
the same data/config (8 threads, see BASELINE.md).  The reference cannot be
built here (Python 2 C-API); the baseline number comes from
``tools/ref_bench.c``, a faithful standalone reimplementation of the
reference hot loop (csrc/workhorse.c:976-1197) measured on this machine's
CPU -- see BASELINE.md "measured" table.

Env knobs: KVARQ_BENCH_READS (default 2000000), KVARQ_BENCH_READLEN (101),
KVARQ_BENCH_WARMUP (1), KVARQ_BENCH_RUNS (5), KVARQ_DRYRUN_REAL (1: also
run the mesh-sharded scan path on the real device and gate it against the
numpy oracle), KVARQ_BENCH_STRICT (with KVARQ_BENCH_FLOOR, default 250,
and KVARQ_BENCH_MEDIAN_FLOOR, default 180: exit non-zero if the best run
falls below FLOOR x baseline or the median below MEDIAN_FLOOR x -- the CI
regression gates; the peak floor rides out tunnel load, the median floor
stops one lucky run from masking a regression).

The default corpus is 2M reads (~430 MB FastQ): real targeted-sequencing
runs are multi-GB, and at this size the scan reaches steady state --
reader/device fully overlapped, the fixed per-scan dispatch tail (~0.1 s
of tunnel round-trips) amortized.  Rounds 1-2 measured 500k reads
(KVARQ_BENCH_READS=500000 reproduces that configuration; it reads ~25%
lower purely from the fixed tail against 0.4 s of work).
'''

import json
import os
import sys
import time

import numpy as np

HERE = os.path.abspath(os.path.dirname(__file__))
sys.path.insert(0, HERE)

# the bench measures the device scan path; never let the small-input
# numpy fast path absorb the (small) warmup scan
os.environ.setdefault('KVARQ_SMALL_SCAN', '0')

# reference-equivalent C scanner (tools/ref_bench.c), 8 threads, same
# data/config, measured on this machine -- identical hit counts to the
# TPU engine (see BASELINE.md "measured" table)
BASELINE_READS_PER_S = 5494.0

N_READS = int(os.environ.get('KVARQ_BENCH_READS', '2000000'))
READLEN = int(os.environ.get('KVARQ_BENCH_READLEN', '101'))
MUTRATE = 0.005         # per-base sequencing-error rate in planted reads
# fraction of reads drawn from template loci; raise for hit-dense
# corpora (e.g. KVARQ_BENCH_PLANT=0.5 with KVARQ_BENCH_MODE=hits)
PLANT_FRAC = float(os.environ.get('KVARQ_BENCH_PLANT', '0.03'))


def load_mtbc():
    from kvarq_tpu.log import set_warning
    set_warning()
    from kvarq_tpu.testsuites import discover_testsuites, load_testsuites
    paths = discover_testsuites([os.path.join(HERE, 'testsuites')])
    return load_testsuites(paths, ['MTBC'])


def template_windows(suites, spacing=25):
    from kvarq_tpu.analyse import Analyser
    analyser = Analyser()
    coverages = analyser.load_coverages(suites, spacing=spacing)
    return [c.plus_seq.bases for c in coverages.values()]


def generate_fastq(path, windows, n_reads, readlen, seed=20260817):
    ''' deterministic synthetic FastQ (vectorized): mostly random
        background plus a fraction of reads drawn from template loci with
        sequencing errors and occasional low-quality tails (exercises
        quality trimming) '''
    rng = np.random.RandomState(seed)
    bases = np.frombuffer(b'ACGT', dtype=np.uint8)
    qhi, qlo = b'I'[0], b'#'[0]   # Q40 / Q2 (Sanger)

    reads = bases[rng.randint(4, size=(n_reads, readlen))]
    planted = np.flatnonzero(rng.rand(n_reads) < PLANT_FRAC) if windows \
        else np.array([], dtype=np.int64)
    for i in planted:
        w = windows[rng.randint(len(windows))].encode()
        if len(w) >= readlen:
            off = rng.randint(len(w) - readlen + 1)
            reads[i] = np.frombuffer(w[off:off + readlen], np.uint8)
        else:
            off = rng.randint(readlen - len(w) + 1)
            reads[i, off:off + len(w)] = np.frombuffer(w, np.uint8)
        errs = np.flatnonzero(rng.rand(readlen) < MUTRATE)
        reads[i, errs] = bases[rng.randint(4, size=len(errs))]

    quals = np.full((n_reads, readlen), qhi, dtype=np.uint8)
    tailed = np.flatnonzero(rng.rand(n_reads) < 0.1)
    tails = rng.randint(1, readlen // 2, size=len(tailed))
    col = np.arange(readlen)
    quals[tailed] = np.where(col >= readlen - tails[:, None], qlo,
                             quals[tailed])

    nl = np.uint8(ord('\n'))
    with open(path, 'wb') as f:
        for lo_ in range(0, n_reads, 65536):
            hi = min(n_reads, lo_ + 65536)
            parts = []
            for i in range(lo_, hi):
                parts.append(b'@r%d\n' % i)
                parts.append(reads[i].tobytes())
                parts.append(b'\n+\n')
                parts.append(quals[i].tobytes())
                parts.append(b'\n')
            f.write(b''.join(parts))


def bench_path(tag):
    plant = '' if PLANT_FRAC == 0.03 else '_p%g' % PLANT_FRAC
    return os.path.join(
        '/tmp', 'kvarq_bench_%s_%dx%d%s.fastq'
        % (tag, N_READS, READLEN, plant))


def oracle_basecounts(found, seqs):
    ''' rebuild per-strand [5, S] base counts from a findseqs hit list
        (the numpy oracle's output) -- the exact quantity countseqs
        accumulates on device (non-AGCTN read bytes are dropped,
        matching the device path's 5-channel one-hot) '''
    from kvarq_tpu.engine import encode
    counts = [np.zeros((encode.NBASE, len(s)), np.int64) for s in seqs]
    for hit, hitseq in zip(found['hits'], found['hitseqs']):
        start = max(0, hit.seq_pos)
        codes = encode.encode_read(hitseq.encode('latin-1'))
        pos = start + np.arange(len(codes))
        valid = codes < encode.NBASE
        np.add.at(counts[hit.seq_nr], (codes[valid], pos[valid]), 1)
    return counts


def assert_device_matches_oracle(device_ret, path, seqs, found=None):
    ''' compare a countseqs() result against the byte-exact numpy golden
        matcher on the same input; abort the bench on ANY divergence.
        :returns: the oracle findseqs result (pure in (path, seqs)), so
        repeated gates over the same input can reuse it via ``found`` '''
    from kvarq_tpu import engine

    if found is None:
        engine.config(backend='numpy', sieve='off')
        try:
            found = engine.findseqs(path, seqs)
        finally:
            engine.config(
                backend=os.environ.get('KVARQ_BACKEND', 'auto'),
                sieve=os.environ.get('KVARQ_SIEVE', 'auto'))

    dev, ora = device_ret['stats'], found['stats']
    for key in ('nseqhits', 'nseqbasehits', 'records_parsed'):
        if dev[key] != ora[key]:
            raise SystemExit('BIT-EXACTNESS FAILURE: stats[%r] device=%r '
                             'oracle=%r' % (key, dev[key], ora[key]))
    want = oracle_basecounts(found, seqs)
    for t, (got, exp) in enumerate(zip(device_ret['basecounts'], want)):
        if not np.array_equal(np.asarray(got, np.int64), exp):
            raise SystemExit('BIT-EXACTNESS FAILURE: basecounts[%d] '
                             '(template %r...) differ' % (t, seqs[t][:20]))
    total = int(np.asarray(dev['nseqhits']).sum())
    print('bit-exactness vs numpy oracle: OK (%d hits, %d templates)'
          % (total, len(seqs)), file=sys.stderr)
    return found


def sharded_dryrun_gate(wpath, seqs, found=None):
    ''' scan the warmup prefix through ShardedScanner on a real-device
        1x1 mesh (pallas, interpret=False, check_vma=True) and gate the
        result against the numpy oracle (``found`` reuses a previously
        computed oracle result for the same input) '''
    import jax
    from kvarq_tpu.parallel import make_mesh, ShardedScanner
    from kvarq_tpu.engine import reader

    t0 = time.time()
    mesh = make_mesh(1, 1, jax.devices()[:1])
    scanner = ShardedScanner(seqs, maxerrors=2, minoverlap=25, mesh=mesh)
    stats = reader.ReaderStats()
    for batch in reader.prefetch(reader.batches(
            [wpath], 33 + 13, 25, stats, batchsize=16384, nthreads=2)):
        scanner.scan_batch(batch)
    scanner.finalize()
    ret = {
        'basecounts': [bc.astype(np.int64) for bc in scanner.coverages()],
        'stats': {
            'nseqhits': tuple(int(x) for x in scanner.seqhits),
            'nseqbasehits': tuple(int(x) for x in scanner.seqbasehits),
            'records_parsed': int(stats.records_parsed),
        },
    }
    print('sharded (mesh) scan on real device: %.1fs, backend=%s'
          % (time.time() - t0, scanner.backend), file=sys.stderr)
    assert_device_matches_oracle(ret, wpath, seqs, found=found)


def main():
    from kvarq_tpu import engine

    suites = load_mtbc()
    windows = template_windows(suites)

    path = bench_path('mtbc')
    if not os.path.exists(path):
        t0 = time.time()
        generate_fastq(path, windows, N_READS, READLEN)
        print('generated %s in %.1fs' % (path, time.time() - t0),
              file=sys.stderr)

    from kvarq_tpu.analyse import Analyser

    seqs = None
    # build the template sequence list exactly like Analyser.scan does
    analyser = Analyser()
    coverages = analyser.load_coverages(suites, spacing=analyser.spacing)
    seqs = [c.plus_seq.bases for c in coverages.values()]
    seqs += [c.minus_seq.bases for c in coverages.values()]

    engine.config(maxerrors=2, minoverlap=25, minreadlength=25,
                  nthreads=8, Amin=chr(33 + 13))  # CLI defaults (config.py)

    admission_s = None
    if int(os.environ.get('KVARQ_BENCH_WARMUP', '1')):
        # warm the jit caches on a small prefix so compile time is excluded
        wpath = bench_path('warmup')
        if not os.path.exists(wpath):
            with open(path) as f, open(wpath, 'w') as g:
                for _ in range(4 * 2048):
                    line = f.readline()
                    if not line:
                        break
                    g.write(line)

        # cold/warm visibility: a fresh environment starts with only the
        # shipped precompiled entries (kvarq_tpu/_precompiled, copied in
        # by ensure_compilation_cache); this reports what the first-ever
        # scan actually paid and from where
        from kvarq_tpu.jaxutil import ensure_compilation_cache
        ensure_compilation_cache()
        n_cached = 0
        try:
            import jax
            cache_dir = jax.config.jax_compilation_cache_dir
            n_cached = len([f for f in os.listdir(cache_dir)
                            if f.endswith('-cache')]) if cache_dir else 0
        except Exception:
            pass
        # separate the shared attachment's session-admission latency (a
        # trivial first round-trip took 3-937 s depending on external
        # tenant load; measured, see BASELINE.md) from this software's
        # own warmup cost, which the next line then reports cleanly
        try:
            import jax.numpy as jnp
            t0 = time.time()
            float(np.asarray(jnp.arange(8.0).sum()))
            admission_s = time.time() - t0
            print('first device contact (attachment admission, '
                  'environmental): %.1fs' % admission_s, file=sys.stderr)
        except Exception:
            pass
        if os.environ.get('KVARQ_BENCH_MODE', 'scan') == 'hits':
            # hit-path warmup + exactness gate: the device matcher must
            # reproduce the numpy oracle's hit list on the prefix
            t0 = time.time()
            warm = engine.findseqs(wpath, seqs)
            print('hit-path warmup (incl. compile): %.1fs'
                  % (time.time() - t0), file=sys.stderr)
            engine.config(backend='numpy', sieve='off')
            try:
                ora = engine.findseqs(wpath, seqs)
            finally:
                engine.config(
                    backend=os.environ.get('KVARQ_BACKEND', 'auto'),
                    sieve=os.environ.get('KVARQ_SIEVE', 'auto'))
            if list(warm['hits']) != list(ora['hits']):
                raise SystemExit('BIT-EXACTNESS FAILURE: hit lists '
                                 'differ (%d vs %d hits)'
                                 % (len(warm['hits']), len(ora['hits'])))
            print('hit-list exactness vs numpy oracle: OK (%d hits)'
                  % len(ora['hits']), file=sys.stderr)
        else:
            t0 = time.time()
            warm = engine.countseqs(wpath, seqs)
            print('cold-start warmup (incl. compile; persistent cache '
                  'held %d entries): %.1fs' % (n_cached, time.time() - t0),
                  file=sys.stderr)
            t0 = time.time()
            engine.countseqs(wpath, seqs)
            print('warm re-scan of the same prefix: %.1fs'
                  % (time.time() - t0), file=sys.stderr)
            # bit-exactness gate: the device path must reproduce the
            # numpy oracle exactly on the warmup prefix -- a miscounting
            # kernel must fail the bench, not ship a wrong perf number
            oracle = assert_device_matches_oracle(warm, wpath, seqs)

        if (os.environ.get('KVARQ_BENCH_MODE', 'scan') != 'hits'
                and int(os.environ.get('KVARQ_DRYRUN_REAL', '1'))):
            # the mesh-sharded scan path (shard_map + psum + pallas,
            # interpret=False, check_vma=True) must ALSO run on the real
            # device and reproduce the oracle -- the standing multi-chip
            # hardware gate (1x1 mesh; topology is validated on the
            # virtual CPU mesh and the driver dryrun)
            sharded_dryrun_gate(wpath, seqs, found=oracle)

    # per-run wall-clock on the shared TPU attachment varies ~2x with
    # external load; report the median of KVARQ_BENCH_RUNS runs as the
    # headline with full dispersion alongside (BENCH schema carries
    # every run), so round-over-round deltas are interpretable.
    # KVARQ_BENCH_MODE=hits measures the findseqs (-H/-x hit-list) path
    # instead of the tensorized countseqs path; combine with
    # KVARQ_BENCH_PLANT for hit-dense corpora.
    mode = os.environ.get('KVARQ_BENCH_MODE', 'scan')
    runs = int(os.environ.get('KVARQ_BENCH_RUNS', '5'))
    samples = []
    for _ in range(max(1, runs)):
        t0 = time.time()
        if mode == 'hits':
            ret = engine.findseqs(path, seqs)
            nhits = len(ret['hits'])
        else:
            ret = engine.countseqs(path, seqs)
            nhits = int(np.asarray(ret['stats']['nseqhits']).sum())
        dt = time.time() - t0
        nrec = ret['stats']['records_parsed']
        print('scanned %d records in %.2fs (%d template hits)'
              % (nrec, dt, nhits), file=sys.stderr)
        samples.append(nrec / dt)

    samples.sort()
    rps = float(np.median(samples))
    peak = samples[-1]
    print(json.dumps({
        'metric': 'scan_reads_per_s' if mode != 'hits'
                  else 'findseqs_reads_per_s',
        'value': round(rps, 1),
        'unit': 'reads/s',
        'vs_baseline': round(rps / BASELINE_READS_PER_S, 2),
        'runs': [round(s, 1) for s in samples],
        'peak': round(peak, 1),
        'peak_vs_baseline': round(peak / BASELINE_READS_PER_S, 2),
        'spread_pct': round(100.0 * (samples[-1] - samples[0])
                            / max(rps, 1e-9), 1),
        'admission_s': round(admission_s, 1) if admission_s else None,
        'floor_x': float(os.environ.get('KVARQ_BENCH_FLOOR', '250')),
        'median_floor_x': float(
            os.environ.get('KVARQ_BENCH_MEDIAN_FLOOR', '180')),
    }))

    # CI regression floors: the peak floor is resilient to shared-tunnel
    # load (which can halve individual runs through no fault of the
    # code), but one lucky run must not mask a real regression -- the
    # median gates too, at a lower floor sized to the observed dispersion
    # (round-4 spread 14.7%, slowest run 77% of peak).  Strict mode turns
    # a breach into a non-zero exit
    breaches = []
    if mode == 'hits':
        return          # floors are calibrated for the countseqs path
    floor = float(os.environ.get('KVARQ_BENCH_FLOOR', '250'))
    if peak < floor * BASELINE_READS_PER_S:
        breaches.append('best run %.0f reads/s is below the %.0fx '
                        'baseline floor (%.0f reads/s)'
                        % (peak, floor, floor * BASELINE_READS_PER_S))
    median_floor = float(os.environ.get('KVARQ_BENCH_MEDIAN_FLOOR', '180'))
    if rps < median_floor * BASELINE_READS_PER_S:
        breaches.append('median %.0f reads/s is below the %.0fx '
                        'baseline median floor (%.0f reads/s)'
                        % (rps, median_floor,
                           median_floor * BASELINE_READS_PER_S))
    for msg in breaches:
        print('REGRESSION: ' + msg, file=sys.stderr)
    if breaches and int(os.environ.get('KVARQ_BENCH_STRICT', '0')):
        raise SystemExit(2)


if __name__ == '__main__':
    main()
