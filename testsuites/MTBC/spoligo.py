'''
MTBC spoligotyping testsuite (behavior-compatible rewrite of reference
testsuites/MTBC/spoligo.py, v0.2); 43 25-bp spacer sequences taken from
SpolPred by Francesc Coll.
'''

VERSION = '0.2'
from kvarq.genes import COMPATIBILITY as GENES_COMPATIBILITY

from kvarq.genes import Genotype, Test, StaticTemplate, Reference, Testsuite


def code(spnrs):
    ''' spoligo0-spoligo42 as a 15 digit code: 14 octal digits of 3 spacers
        each, plus one binary digit for spoligo42 '''
    value = 0
    spoligo42 = '0'
    for spnr in spnrs:
        if spnr == 42:
            spoligo42 = '1'
        else:
            value += 2 ** (41 - spnr)
    octal = oct(value)[2:]
    octal = '0' * (14 - len(octal)) + octal
    return octal + spoligo42


class SpoligoTestsuite(Testsuite):

    def __str__(self):
        return 'TB spoligos'

    def _analyse(self, coverages):

        spnrs = [spnr for spnr, spoligo in enumerate(self.tests)
                 if spoligo.template.validate(coverages[spoligo])]

        # The reference's low-coverage check (spoligo.py:42) contains a
        # Python-2 loop-variable leak: the comprehension variable is
        # misspelled, so the sum effectively averages the coverage of the
        # *last enumerated test* (index 42) only.  Reproduced faithfully:
        last = self.tests[len(self.tests) - 1]
        if not spnrs or coverages[last].mean() < 10:
            remark = ' -- low coverage (mean below 10x)'
        else:
            remark = ''

        spoct = code(spnrs)

        spbin = ''.join(
            [bin(int(x))[2:].rjust(3, '0') for x in spoct[:14]] +
            [bin(int(x))[2:] for x in spoct[14:]]
        )

        return ' '.join([spoct, spbin]) + remark


class Spoligo(Genotype):

    def __init__(self, number):
        assert 0 <= number <= 42
        super().__init__('spoligo' + str(number))
        self.number = number


spolpred = Reference('SpolPred.cpp by Francesc Coll')

SPACERS = [
    'TGATCCAGAGCCGGCGACCCTCTAT',
    'CAAAAGCTGTCGCCCAAGCATGAGG',
    'TAGAAGGCGATCACTGGAAGCACGG',
    'CTGATGATTGGTCGGCGTATGACGT',
    'TAATCCCGCACAAGTGGTCAGAAAA',
    'GAAATTGAAGCCGGAAATGACGACG',
    'GCAGCCCCGAGTACTCGCTCTCCTC',
    'CGGCGAGGCTGGGGGCGGTTTCACG',
    'GCTGTCAGCACATGGGATTCCGAGT',
    'GGAAGTCAACTAGAGCGGGTGTCGA',
    'CCAGGTTGCCGCCGCCGTTGCTCAC',
    'ATCTCCCCGGGCGGGCAGCAGATAT',
    'GGGAGAGGGAATGGCAATGATGGTC',
    'CCGAGCCGACCATCCGCATCACACC',
    'CGAAATTCACTGCGCGTTATTCAAG',
    'GATTTACGACGCTGACGGGAACTCG',
    'CGGAGTCATCCGCGCGGGCCGGCGC',
    'CATCTGCAGCTCGCCCGGGTCCATG',
    'ACCAGGATCAGCGCCAAGCCAGTTA',
    'TGATCTTCTCTCCTGGCGAGGTCAA',
    'TCGACGATTGGGACATCGACATCGA',
    'TTGTCTCAATCGTGCCGTCTGCGGT',
    'CGAGCTGGACCGCATCAGCGATGCT',
    'CGAGCACGTCTCACCCAGCAGGCGG',
    'TGACAGGGTGCGGTGGTCGCTGATC',
    'GCGCCGGATGATGGTGGTGCTGAAG',
    'ATCCGCGGGAAGAGATCACGAATCC',
    'GTTGTGATCGCTAAACGCCGGGGCA',
    'TGGTCGTGTCGTGGAGCCTGTATTT',
    'GGCTGGAAAAGGGCGCGGGGCAACC',
    'ACTTGATCGACGCGAACCTGTCTGA',
    'TGAACACGCCGATACCTATTTGGTC',
    'TCAAGTGCGGCACCGCCGTCATGTC',
    'TTCGACGGTGTGGGCGAGGTGACTT',
    'GTTGGAAGCGTTTCGAGCGTACGGA',
    'GCTGCGGATGTGGTGCTGGATTTCG',
    'AAGGGGGACTGTGGACGAGTTCGCG',
    'GCGCACAACGCATCCGCCATCCACG',
    'CCACGCCGATTTACTGGCCATCGTC',
    'GGACCTGTATGAGGCACAGATGGCG',
    'TACCTGATAGAAGCCGGAAAGCTCC',
    'GTCGCGCTCGTCCATGTCCCACCAT',
    'CTCCCGCACCCGGTGCGATTCTGCG',
]

assert len(SPACERS) == 43

spoligo = SpoligoTestsuite(
    [Test(StaticTemplate(bases), Spoligo(i), spolpred)
     for i, bases in enumerate(SPACERS)],
    VERSION)
