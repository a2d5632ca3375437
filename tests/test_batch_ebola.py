'''
Executable multi-suite batch workflow -- the BASELINE.json north-star
config "multi-file batch scan (ebola-sierraleone14 + MTBC) sharded
across hosts with merged JSON", golden-tested end to end.

The ``ebola/sierraleone14`` suite is the tutorial's worked example
(docs/tutorial.md; reference docs/tutorial.rst:14-143) checked in as a
real fixture suite over a deterministic synthetic EBOV76 genome
(tools/make_ebov76.py).  The sample generated here carries the four SL1
sublineage SNPs (derived base planted) and ancestral coverage over the
SL2/SL3 positions, so the golden call is exactly the SL1 markers.
'''

import json
import os
import os.path

import numpy as np
import pytest

from test_cli import main, HERE, MTBC_fastq2, needs_genome

EBOV_FASTA = os.path.join(HERE, os.pardir, 'testsuites', 'ebola',
                          'EBOV76.fasta')

needs_ebov = pytest.mark.skipif(
    not os.path.exists(EBOV_FASTA),
    reason='run tools/make_ebov76.py first')

SL1_GOLDEN = ['SL1::SNP1849TC', 'SL1::SNP6283CT',
              'SL1::SNP13856AG', 'SL1::SNP15660TC']

# suite SNPs: pos -> (ancestral, derived, sublineage)
SNPS = {
    800: ('C', 'T', 'SL2'), 1849: ('T', 'C', 'SL1'),
    6283: ('C', 'T', 'SL1'), 8928: ('A', 'C', 'SL2'),
    10218: ('G', 'A', 'SL3'), 13856: ('A', 'G', 'SL1'),
    15660: ('T', 'C', 'SL1'), 15963: ('G', 'A', 'SL2'),
    17142: ('T', 'C', 'SL2'),
}

READLEN = 101


def _write_ebov_sample(path, genome, rng):
    ''' deterministic EM119-like sample: 20 reads with the derived base
        over every SL1 SNP, 10 ancestral reads over every SL2/SL3 SNP,
        plus background reads drawn from random loci '''
    reads = []
    for pos, (anc, der, sub) in sorted(SNPS.items()):
        n = 20 if sub == 'SL1' else 10
        for _ in range(n):
            # keep the SNP >= 30 bases from both read edges
            start = pos - 1 - rng.randint(30, READLEN - 30)
            read = list(genome[start:start + READLEN])
            assert read[pos - 1 - start] == anc
            if sub == 'SL1':
                read[pos - 1 - start] = der
            reads.append(''.join(read))
    for _ in range(500):
        start = rng.randint(0, len(genome) - READLEN)
        reads.append(genome[start:start + READLEN])
    order = rng.permutation(len(reads))
    # Q40 bases with a Q2 final base: the '#' pins the vendor-variant
    # inference to Sanger (all-'I' is ambiguous) and exercises trimming
    qual = 'I' * (READLEN - 1) + '#'
    with open(path, 'w') as f:
        for i, j in enumerate(order):
            f.write('@ebov%d\n%s\n+\n%s\n' % (i, reads[j], qual))
    return len(reads)


@pytest.fixture(scope='module')
def ebov_fastqs(tmp_path_factory):
    ''' the sample split over two files (exercises multi-file sharding);
        scanning both == scanning the sample '''
    with open(EBOV_FASTA) as f:
        f.readline()
        genome = f.read().replace('\n', '')
    rng = np.random.RandomState(20140525)
    tmp = tmp_path_factory.mktemp('ebov')
    whole = str(tmp / 'EM119.fastq')
    _write_ebov_sample(whole, genome, rng)
    with open(whole) as f:
        lines = f.readlines()
    half = 4 * (len(lines) // 8)
    a, b = str(tmp / 'EM119_shard0.fastq'), str(tmp / 'EM119_shard1.fastq')
    with open(a, 'w') as f:
        f.writelines(lines[:half])
    with open(b, 'w') as f:
        f.writelines(lines[half:])
    return whole, a, b


@needs_ebov
def test_scan_sierraleone14(ebov_fastqs, tmp_path):
    ''' single-sample scan with the tutorial suite calls exactly the
        four planted SL1 markers '''
    whole, _, _ = ebov_fastqs
    out = str(tmp_path / 'EM119.json')
    main(['scan', '-l', 'ebola/sierraleone14', '-f', whole, out])
    data = json.load(open(out))
    assert data['analyses']['ebola/sierraleone14'] == SL1_GOLDEN


@needs_ebov
@needs_genome
def test_batch_merged_multi_suite(ebov_fastqs, tmp_path):
    ''' the north-star config: one `kvarq batch` over an ebola corpus +
        an MTBC sample with both suites loaded, merged into ONE json --
        the ebola templates see only ebola reads and vice versa, so the
        merged calls equal the per-sample goldens '''
    _, a, b = ebov_fastqs
    out = str(tmp_path / 'merged.json')
    main(['batch', '-l', 'ebola/sierraleone14', '-l', 'MTBC/phylo',
          '-f', a, b, MTBC_fastq2, out])
    data = json.load(open(out))
    assert data['analyses']['ebola/sierraleone14'] == SL1_GOLDEN
    # the MTBC sample's phylo call must match a plain scan of that file
    ref = str(tmp_path / 'mtbc_only.json')
    main(['scan', '-l', 'MTBC/phylo', '-f', MTBC_fastq2, ref])
    want = json.load(open(ref))['analyses']['MTBC/phylo']
    assert data['analyses']['MTBC/phylo'] == want
    assert sorted(os.path.basename(f)
                  for f in data['info']['fastq']) == sorted(
        os.path.basename(f) for f in (a, b, MTBC_fastq2))


@needs_ebov
@needs_genome
def test_batch_per_sample_multi_suite(ebov_fastqs, tmp_path):
    ''' --per-sample over the mixed corpus: one result json per sample,
        each carrying both suites' analyses, plus a summary.csv row per
        sample '''
    whole, _, _ = ebov_fastqs
    outdir = str(tmp_path / 'results')
    main(['batch', '--per-sample', '-l', 'ebola/sierraleone14',
          '-l', 'MTBC/phylo', '-f', whole, MTBC_fastq2, outdir])
    ej = json.load(open(os.path.join(outdir, 'EM119.json')))
    mj = json.load(open(os.path.join(outdir, 'N0116_1_hits_1k.json')))
    assert ej['analyses']['ebola/sierraleone14'] == SL1_GOLDEN
    # no MTBC reads in the EBOV sample: no lineage + low-coverage remark
    assert ej['analyses']['MTBC/phylo'].startswith('?')
    assert mj['analyses']['ebola/sierraleone14'] == []
    assert mj['analyses']['MTBC/phylo']            # a real lineage call
    csv = open(os.path.join(outdir, 'summary.csv')).read()
    assert 'EM119' in csv and 'N0116_1_hits_1k' in csv
