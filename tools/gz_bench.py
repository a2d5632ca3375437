#!/usr/bin/env python
'''
Host-reader throughput on large compressed inputs: plain FastQ vs BGZF
(parallel per-block libdeflate decode) vs single-member gzip (pipelined
streaming zlib ring) -- validates that compressed input costs little
next to plain on real-data-scale files (reference workflows feed
multi-GB ``.fastq.gz``, /root/reference/docs/tutorial.rst:378-380).

Builds a big corpus once (bench.py's synthetic reads repeated), then
drains kvarq_tpu.engine.reader.batches over each variant.

Usage:
    python tools/gz_bench.py [--repeat 32] [--nthreads 2] [--sieve]
'''

import argparse
import os
import struct
import sys
import time
import zlib

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def write_bgzf(dst, src, block=60000, level=1):
    ''' re-compress ``src`` into BGZF blocks (level 1: bgzip-style fast;
        decode speed is what we measure) '''
    with open(src, 'rb') as fin, open(dst, 'wb') as fout:
        while True:
            chunk = fin.read(block)
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            cdata = co.compress(chunk) + co.flush()
            bsize = 12 + 6 + len(cdata) + 8
            fout.write(struct.pack('<BBBBIBBH', 0x1f, 0x8b, 8, 4, 0, 0,
                                   0xff, 6))
            fout.write(struct.pack('<BBHH', ord('B'), ord('C'), 2,
                                   bsize - 1))
            fout.write(cdata)
            fout.write(struct.pack('<II', zlib.crc32(chunk) & 0xffffffff,
                                   len(chunk)))
            if not chunk:
                break


def write_gz(dst, src, level=1):
    co = zlib.compressobj(level, zlib.DEFLATED, 16 + 15)
    with open(src, 'rb') as fin, open(dst, 'wb') as fout:
        while True:
            chunk = fin.read(1 << 22)
            if not chunk:
                break
            fout.write(co.compress(chunk))
        fout.write(co.flush())


def drain(fname, nthreads, sieve=None):
    from kvarq_tpu.engine import reader
    stats = reader.ReaderStats()
    t0 = time.time()
    nreads = 0
    for batch in reader.batches([fname], ord('.'), 25, stats,
                                batchsize=65536, sieve=sieve,
                                nthreads=nthreads):
        nreads += len(batch)
    dt = time.time() - t0
    return stats.records_parsed, nreads, stats.parsed, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--repeat', type=int, default=32,
                    help='copies of the 500k-read bench file (~107 MB raw '
                         'each)')
    ap.add_argument('--nthreads', type=int, default=2)
    ap.add_argument('--sieve', action='store_true',
                    help='also run the MTBC k-mer sieve (production path)')
    ap.add_argument('--sweep', default=None, metavar='N1,N2,...',
                    help='thread-scaling mode: run the plain (and, with '
                         '--sweep-gz, the gz) variant at each worker '
                         'count and print a scaling table (sets '
                         'KVARQ_THREADS_EXACT so the cores+2 clamp does '
                         'not rewrite the requested counts)')
    ap.add_argument('--sweep-gz', action='store_true',
                    help='include the single-member gz variant in --sweep')
    args = ap.parse_args()

    import bench
    base = bench.bench_path('mtbc')
    if not os.path.exists(base):
        suites = bench.load_mtbc()
        windows = bench.template_windows(suites)
        bench.generate_fastq(base, windows, bench.N_READS, bench.READLEN)

    big = '/tmp/kvarq_gzbench_%d.fastq' % args.repeat
    if not os.path.exists(big):
        t0 = time.time()
        with open(big, 'wb') as out, open(base, 'rb') as fin:
            data = fin.read()
            for _ in range(args.repeat):
                out.write(data)
        print('built %s (%.2f GB) in %.0fs'
              % (big, os.path.getsize(big) / 1e9, time.time() - t0),
              file=sys.stderr)
    for variant, builder in (('.bgzf.gz', write_bgzf), ('.gz', write_gz)):
        dst = big + variant
        if not os.path.exists(dst):
            t0 = time.time()
            builder(dst, big)
            print('built %s (%.2f GB) in %.0fs'
                  % (dst, os.path.getsize(dst) / 1e9, time.time() - t0),
                  file=sys.stderr)

    sieve = None
    if args.sieve:
        from kvarq_tpu.analyse import Analyser
        from kvarq_tpu.engine.sieve import KmerSieve
        suites = bench.load_mtbc()
        an = Analyser()
        covs = an.load_coverages(suites, spacing=25)
        seqs = [c.plus_seq.bases for c in covs.values()]
        seqs += [c.minus_seq.bases for c in covs.values()]
        sieve = KmerSieve.build(seqs, 2, 25, 25)

    if args.sweep:
        counts = [int(x) for x in args.sweep.split(',')]
        os.environ['KVARQ_THREADS_EXACT'] = '1'
        variants = [('plain', big)] + \
            ([('gz', big + '.gz')] if args.sweep_gz else [])
        base_rate = {}
        print('%-6s %8s %12s %9s %8s'
              % ('input', 'threads', 'reads/s', 'MB/s', 'scaling'))
        for label, fname in variants:
            for nt in counts:
                nrec, _, parsed, dt = drain(fname, nt, sieve)
                rate = nrec / dt
                base_rate.setdefault(label, rate)
                print('%-6s %8d %12.0f %9.0f %7.2fx'
                      % (label, nt, rate, parsed / dt / 1e6,
                         rate / base_rate[label]))
        return

    results = {}
    for label, fname in (('plain', big), ('bgzf', big + '.bgzf.gz'),
                         ('gz', big + '.gz')):
        nrec, nreads, parsed, dt = drain(fname, args.nthreads, sieve)
        results[label] = nrec / dt
        print('%-6s %9d records, %5.2f GB decompressed in %6.1fs: '
              '%8.0f reads/s, %6.0f MB/s'
              % (label, nrec, parsed / 1e9, dt, nrec / dt,
                 parsed / dt / 1e6))
    for label in ('bgzf', 'gz'):
        print('%s vs plain: %.0f%%'
              % (label, 100 * results[label] / results['plain']))


if __name__ == '__main__':
    main()
