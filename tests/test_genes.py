'''
Genetics-core tests (ported from reference tests/test_genes.py): codon
arithmetic, SNP flank extraction against the reconstructed ancestor genome,
mutation-validation thresholds, .bases/.fa equivalence.
'''

import os.path
import random

import pytest

from kvarq_tpu import genes
from kvarq_tpu import analyse
from kvarq_tpu.genes import TemplateFromGenome, Gene, Genome

HERE = os.path.abspath(os.path.dirname(__file__))
MTBC = os.path.join(HERE, os.path.pardir, 'testsuites', 'MTBC')


@pytest.fixture(scope='module')
def ancestor():
    path = os.path.join(MTBC, 'MTB_ancestor_reference.bases')
    if not os.path.exists(path):
        pytest.skip('run tools/reconstruct_genome.py first')
    return Genome(path, 'MTB ancestor')


def test_gene(ancestor):
    rpoB = Gene(genome=ancestor, identifier='rpoB',
                start=759807, stop=763325, plus_strand=True)
    assert rpoB.mut2str(761082, 'C') == 'rpoB.G426R'

    MTB10 = Gene(genome=ancestor, identifier='MTB10',
                 start=1021344, stop=1021643, plus_strand=False)
    assert MTB10.mut2str(1021600, 'C') == 'MTB10.T15R'
    assert MTB10.mut2str(1021601, 'A') == 'MTB10.T15S'

    # rRNA, not coding
    rrsS = Gene(ancestor, 'rrsS', 1471846, 1473382, coding=False)
    assert rrsS.mut2str(1471850, 'C') == 'rrsS.5GC'

    # purely hypothetical
    rrsS_rev = Gene(ancestor, 'rrsS_rev', 1471846, 1473382, coding=False,
                    plus_strand=False)
    assert rrsS_rev.mut2str(1473381, 'T') == 'rrsS_rev.2GA'


def test_SNP(ancestor):
    x = genes.SNP(genome=ancestor, pos=3920109, base='T')
    assert x.seq(spacing=3).bases == 'CGATATT'

    x = genes.SNP(genome=ancestor, pos=3920109, base='T')
    assert x.seq(spacing=12).bases == 'TTACTGCGCCGATATTCGCACACCT'

    x = genes.SNP(genome=ancestor, pos=2427828, base='C')
    assert x.seq(spacing=12).bases == 'CCACAGTGTGAGCCCTAGTCCGACG'


def test_reverse():
    assert genes.Sequence('AAACGT').reverse().bases == 'ACGTTT'


def test_code(ancestor):
    seq = genes.Sequence('GCTTGTGATTGC')
    for i in range(4):
        for j in range(3):
            assert seq.get_aa(i * 3 + j) == 'ACDC'[i]
    assert seq.get_aa(1, [(1, 'T')]) == 'V'
    assert seq.transcribe() == 'ACDC'

    # forward coding template
    Rv0880 = TemplateFromGenome(ancestor, 978934, 979365, direction='+')
    Rv0880seq = Rv0880.seq()
    assert Rv0880seq.plus_strand
    assert Rv0880seq.bases.startswith('GTGCTTGACAGCGA')
    assert Rv0880seq.transcribe().startswith('VLDSDARLASDL')
    assert Rv0880seq.transcribe(mutations=((1, 'G'),)).startswith(
        'GLDSDARLASDL')

    # reverse coding template
    Rv0883c = TemplateFromGenome(ancestor, 980506, 981267, direction='-')
    Rv0883cseq = Rv0883c.seq()  # sequence from '+' strand!
    assert Rv0883cseq.plus_strand
    assert Rv0883cseq.bases.startswith('CTAGCGACG')
    assert Rv0883c.transcribe().startswith('MRELKVVGLD')
    pos = len(Rv0883cseq) - 2 - 1  # second last base
    assert Rv0883c.transcribe(mutations=((pos, 'G'),)).startswith(
        'IRELKVVGLD')


def test_mutations(ancestor):
    # SNP mutation validation
    snp1000 = genes.SNP(ancestor, 1000, base='C', orig='G')
    seq = snp1000.seq(spacing=25)
    coverage = analyse.Coverage(seq)
    # no mutations
    assert not snp1000.validate(coverage)
    # not enough coverage
    coverage.mutations = dict([(25, 'C')])
    assert not snp1000.validate(coverage)
    # not enough mutations
    coverage.coverage = [20] * len(coverage.coverage)
    coverage.mutations = dict([(25, 'C' * 10)])
    assert not snp1000.validate(coverage)
    # this should validate
    coverage.mutations = dict([(25, 'C')])
    assert snp1000.validate(coverage)

    # region template mutation filtering
    embB = genes.TemplateFromGenome(ancestor, 4246514, 4249810,
                                    direction='+')
    seq = embB.seq(spacing=25)
    coverage = analyse.Coverage(seq)
    coverage.mutations = dict([
        (25 + 0, 'TGC'),            # no dominant mutation
        (25 + 4, 'GGGGGGGGGGGAT'),  # dominant G
    ])
    # mutation not validated when coverage very high
    coverage.coverage = [1000] * len(coverage.coverage)
    assert len(embB.mutations(coverage)) == 0
    # one mutation detected with coverage == mutation count
    coverage.coverage = [10] * len(coverage.coverage)
    mutations = embB.mutations(coverage)
    assert len(mutations) == 1
    assert mutations[0] == (4, 'G')

    aa_mutations = embB.aa_mutations(mutations)
    assert len(aa_mutations) == 1


def test_genome():
    g1 = Genome(os.path.join(HERE, 'test_genes.bases'))
    g2 = Genome(os.path.join(HERE, 'test_genes.fa'))
    n = 1000
    m = (50, 100)
    random.seed(3)
    for i in range(10):
        pos = random.randint(1, n - m[1])
        length = random.randint(*m)
        assert g1.read(pos, length) == g2.read(pos, length), \
            'Genome.read(%d, %d) differs between .bases and .fa' % (
                pos, length)


def test_load_testsuite_errors(tmp_path):
    from kvarq_tpu.genes import load_testsuite, TestsuiteLoadingException

    p = tmp_path / 'broken.py'
    p.write_text('raise RuntimeError("boom")')
    with pytest.raises(TestsuiteLoadingException):
        load_testsuite(str(p))

    p = tmp_path / 'nocompat.py'
    p.write_text('x = 1')
    with pytest.raises(TestsuiteLoadingException):
        load_testsuite(str(p))

    p = tmp_path / 'futurecompat.py'
    p.write_text('GENES_COMPATIBILITY = "9.9"')
    with pytest.raises(TestsuiteLoadingException):
        load_testsuite(str(p))

    p = tmp_path / 'noname.py'
    p.write_text('GENES_COMPATIBILITY = "0.0"')
    with pytest.raises(TestsuiteLoadingException):
        load_testsuite(str(p))

    # dash in filename truncates the name; py2-style file() works
    p = tmp_path / 'good-1.0.py'
    p.write_text('GENES_COMPATIBILITY = "0.0"\n'
                 'from kvarq.genes import Testsuite\n'
                 'good = Testsuite([], "1.0")\n')
    ts = load_testsuite(str(p))
    assert ts.version == '1.0'
