'''
MTBC drug-resistance testsuite (behavior-compatible rewrite of reference
testsuites/MTBC/resistance.py, v2.0).

60 resistance SNPs plus 4 mutation regions (katG codon 315, rpoB RRDR,
gyrA QRDR, pncA) over 13 drug/gene combinations; data restated as tables.
The ``_analyse`` flow reproduces the reference exactly, including its
reporting quirks (the percentage annotation of region mutations reuses the
``minf`` value left over from the last SNP processed).
'''

VERSION = '2.0'
from kvarq.genes import COMPATIBILITY as GENES_COMPATIBILITY

from kvarq.genes import Genotype, Test, Reference, SNP, Testsuite
from kvarq.genes import TemplateFromGenome, Gene

from _util import ancestor


class ResistanceTestsuite(Testsuite):

    def __str__(self):
        return 'TB resistance mutations & mutation regions'

    def _analyse(self, coverages):
        ret = []

        # set if any region/SNP shows a dominant base below 90%
        mixed = False
        minf = 1.0

        for test in self.tests:

            coverage = coverages[test]
            seq = test.template.seq()

            # a) SNPs
            if isinstance(test.template, SNP):
                minf = coverage.minf()
                if minf < 0.9:
                    mixed = True
                if test.template.validate(coverage):
                    ret.append(str(test))
                    ret[-1] += '=' + test.genotype.gene.mut2str(
                        test.template.start, test.template.base)
                    if minf < 0.9:
                        ret[-1] += ' (' + str(int(100 * minf)) + '%)'
                continue

            # b) regions
            if not mixed and coverage.minf() < 0.9:
                mixed = True
            mutations = test.template.mutations(coverage)
            output = []
            for pos, newbase in mutations:

                oldbase = seq[pos]
                output.append('%d%s%s' % (
                    pos + test.template.start, oldbase, newbase))

                if test.genotype.gene:
                    output[-1] += '=' + test.genotype.gene.mut2str(
                        pos + test.template.start, newbase)

                mutf = list(coverage.fractions_at(pos).values())[0]
                if mutf < 0.9:
                    # (reference quirk: annotates with the last SNP's minf)
                    output[-1] += ' (' + str(int(100 * minf)) + '%)'

            aa1 = test.template.transcribe()
            aa2 = test.template.transcribe(mutations)

            # ignore resistance mutations without aa change
            if test.genotype.gene.coding and aa1 == aa2:
                continue

            # notify if mutation is not documented in "poslist"
            if hasattr(test.template, 'poslist'):
                poslist = test.template.poslist
                if poslist and not [m for m in mutations
                                    if m[0] + test.template.start in poslist]:
                    output.append('[NONE OF MUTATIONS DOCUMENTED IN REFERENCE]')

            ret.append(str(test.genotype) + ' [' + ' '.join(output) + ']')

        RRDR_tests = [test for test in self.tests if test.genotype == RRDR]
        assert len(RRDR_tests) == 1
        if coverages[RRDR_tests[0]].mean(include_margins=False) < 10:
            ret.append('remark: low coverage (RRDR below 10x)')
        if mixed:
            ret.append('remark: mixed coverage')

        return ret


class DrugResistance(Genotype):

    def __init__(self, drug, gene, remarks=None):
        identifier = drug + ' resistance'
        if remarks:
            identifier += ' (' + remarks + ')'
        super().__init__(identifier)
        self.drug = drug
        self.gene = gene
        self.remarks = remarks


# MDR : rifampicin + any of (isoniazid, ?)
# XDR : MDR + fluoroquinolone + injectable (aminoglycosides)

inhA = DrugResistance('Isoniazid',
                      Gene(ancestor, 'inhA', 1674202, 1675011,
                           promoter_end=1673440))
katG = DrugResistance('Isoniazid',
                      Gene(ancestor, 'katG', 2153889, 2156111,
                           plus_strand=False))
RRDR = DrugResistance('Rifampicin',
                      Gene(ancestor, 'rpoB', 759807, 763325), 'RRDR')
rpoA = DrugResistance('Rifampicin',
                      Gene(ancestor, 'rpoA', 3877464, 3878507,
                           plus_strand=False), 'compensatory')
rpoC = DrugResistance('Rifampicin',
                      Gene(ancestor, 'rpoC', 763370, 767320), 'compensatory')
QRDR = DrugResistance('Fluoroquinolones',
                      Gene(ancestor, 'gyrA', 7302, 9818), 'QRDR')
gyrA = DrugResistance('Fluoroquinolones', Gene(ancestor, 'gyrA', 7302, 9818))
gyrB = DrugResistance('Fluoroquinolones', Gene(ancestor, 'gyrB', 5123, 7267))
rpsL = DrugResistance('Streptomycin', Gene(ancestor, 'rpsL', 781560, 781934))
rrsS = DrugResistance('Streptomycin',
                      Gene(ancestor, 'rrsS', 1471846, 1473382))
rrsK = DrugResistance('Kanamycin/Amikacin',
                      Gene(ancestor, 'rrsK', 1471846, 1473382))
embB = DrugResistance('Ethambutol', Gene(ancestor, 'embB', 4246514, 4249810))
pncA = DrugResistance('Pyrazinamide',
                      Gene(ancestor, 'pncA', 2288681, 2289241,
                           plus_strand=False))


comas12 = Reference('Comas et al 2012 Nat Gen: Compensatory mutations...')
ramaswamy98 = Reference('Ramaswamy et al., Tuber Lung Dis 1998')
sun08 = Reference('Sun et al., Antimicr Agents 2008')
tbdream = Reference('TBDReamDB')
david = Reference('David')

# (position, ancestral, mutant, genotype, reference)
SNP_TABLE = [
    (2155276, 'C', 'T', katG, tbdream),
    (1673432, 'T', 'A', inhA, tbdream),
    (1673432, 'T', 'C', inhA, tbdream),
    (1673425, 'C', 'T', inhA, tbdream),
    (3877949, 'T', 'C', rpoA, comas12),
    (3877949, 'T', 'G', rpoA, comas12),
    (3877960, 'A', 'G', rpoA, comas12),
    (3877960, 'A', 'C', rpoA, comas12),
    (764669, 'C', 'G', rpoC, comas12),
    (764670, 'C', 'G', rpoC, comas12),
    (764817, 'T', 'C', rpoC, comas12),
    (764817, 'T', 'G', rpoC, comas12),
    (764819, 'T', 'G', rpoC, comas12),
    (764822, 'G', 'A', rpoC, comas12),
    (764822, 'G', 'C', rpoC, comas12),
    (764840, 'A', 'G', rpoC, comas12),
    (764841, 'T', 'C', rpoC, comas12),
    (764918, 'G', 'C', rpoC, comas12),
    (765461, 'A', 'C', rpoC, comas12),
    (765462, 'A', 'G', rpoC, comas12),
    (765463, 'C', 'G', rpoC, comas12),
    (7606, 'C', 'A', gyrA, tbdream),
    (7677, 'G', 'A', gyrA, tbdream),
    (7678, 'C', 'G', gyrA, tbdream),
    (6767, 'G', 'A', gyrB, tbdream),
    (6768, 'G', 'A', gyrB, tbdream),
    (781687, 'A', 'G', rpsL, tbdream),
    (781822, 'A', 'C', rpsL, tbdream),
    (781822, 'A', 'T', rpsL, tbdream),
    (781822, 'A', 'G', rpsL, tbdream),
    (1472337, 'C', 'A', rrsS, tbdream),
    (1472337, 'C', 'G', rrsS, tbdream),
    (1472337, 'C', 'T', rrsS, tbdream),
    (1472358, 'C', 'A', rrsS, tbdream),
    (1472358, 'C', 'G', rrsS, tbdream),
    (1472358, 'C', 'T', rrsS, tbdream),
    (1472359, 'A', 'C', rrsS, tbdream),
    (1472359, 'A', 'G', rrsS, tbdream),
    (1472359, 'A', 'T', rrsS, tbdream),
    (1472362, 'C', 'A', rrsS, tbdream),
    (1472362, 'C', 'G', rrsS, tbdream),
    (1472362, 'C', 'T', rrsS, tbdream),
    (1472752, 'A', 'C', rrsS, tbdream),
    (1472752, 'A', 'G', rrsS, tbdream),
    (1472752, 'A', 'T', rrsS, tbdream),
    (1473246, 'A', 'C', rrsK, tbdream),
    (1473246, 'A', 'G', rrsK, tbdream),
    (1473246, 'A', 'T', rrsK, tbdream),
    (1473247, 'C', 'A', rrsK, tbdream),
    (1473247, 'C', 'G', rrsK, tbdream),
    (1473247, 'C', 'T', rrsK, tbdream),
    (4247429, 'A', 'G', embB, tbdream),
    (4247431, 'G', 'A', embB, tbdream),
    (4247431, 'G', 'T', embB, tbdream),
    (4247431, 'G', 'C', embB, tbdream),
    (4247429, 'A', 'C', embB, tbdream),
    (4247730, 'G', 'C', embB, tbdream),
    (4248003, 'A', 'G', embB, tbdream),
]

resistance_SNPs = [
    Test(SNP(genome=ancestor, pos=pos, orig=orig, base=base), genotype, ref)
    for pos, orig, base, genotype, ref in SNP_TABLE
]

resistance_regions = [
    Test(TemplateFromGenome(genome=ancestor, start=2155167, stop=2155169,
                            direction='-',
                            aa_pos0=(2155167 - 2153889) // 3 + 1),
         katG, ramaswamy98),
    Test(TemplateFromGenome(genome=ancestor, start=761082, stop=761162),
         RRDR, ramaswamy98),
    Test(TemplateFromGenome(genome=ancestor, start=7521, stop=7583,
                            poslist=[7521, 7522, 7523, 7569, 7570, 7571,
                                     7572, 7573, 7574, 7581, 7582, 7583]),
         QRDR, sun08),
    Test(TemplateFromGenome(genome=ancestor, start=2288681, stop=2289241,
                            direction='-'),
         pncA, david),
]

resistance = ResistanceTestsuite(resistance_SNPs + resistance_regions,
                                 VERSION)
