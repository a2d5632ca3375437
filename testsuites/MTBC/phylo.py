'''
MTBC main-lineage SNP barcode testsuite (behavior-compatible rewrite of
reference testsuites/MTBC/phylo.py, v0.7).

Three phylogenetic SNPs per main lineage 1-7 + animal lineage, plus three
Beijing-sublineage SNPs; a lineage is called when at least two of its SNPs
validate.  SNP data from Stucki et al. PLoS ONE 2012 / Comas PLoS ONE 2009,
restated as a data table.
'''

VERSION = '0.7'
from kvarq.genes import COMPATIBILITY as GENES_COMPATIBILITY

from kvarq.log import lo
from kvarq.genes import Reference, Test, SNP, Genotype, Testsuite

from _util import ancestor


class Lineage(Genotype):

    roots = []

    def __init__(self, name, parent=None, color=None, origin=None,
                 comutant=None):
        super().__init__(name)
        self.name = name
        self.parent = parent
        self.color = color
        self.origin = origin
        self.comutant = comutant
        self.children = []

        if parent:
            parent.children.append(self)
        else:
            Lineage.roots.append(self)


class PhyloTestsuite(Testsuite):

    def __str__(self):
        return 'TB lineage SNPs'

    def score_SNPs(self, genotypes, coverages):
        ''' {genotype: [bool, ...]}: per SNP of each genotype, whether the
            mutant template validated '''
        ret = {}
        for test in self.tests:
            coverage = coverages[test]
            genotype = test.genotype
            if genotype in genotypes:
                ret.setdefault(genotype, []).append(
                    bool(test.template.validate(coverage)))
        return ret

    def _analyse(self, coverages):
        mls = []

        for ml, xs in self.score_SNPs(Lineage.roots, coverages).items():
            lo.debug(str(ml) + ' : ' + str(xs))

            if sum(xs) > 1:
                # at least two positive SNPs call the lineage
                mls.append(ml.name)

                if ml.children:
                    sls = []

                    # co-mutants: same sublineage name may appear with
                    # several comutant markers
                    slsc = self.score_SNPs(ml.children, coverages)
                    slsc_byname = {}
                    slsc_comutants = {}
                    for sl, xs_ in slsc.items():
                        slsc_byname.setdefault(sl.name, []).extend(xs_)
                        if sl.comutant:
                            slsc_comutants.setdefault(sl.name, []).extend(
                                [sl.comutant] * sum(xs_))

                    for slname, xs_ in slsc_byname.items():
                        comutants = ''.join(slsc_comutants.get(slname, []))
                        lo.debug('sublineage ' + slname + ' : ' + str(xs_)
                                 + ' comutants ' + comutants)
                        if sum(xs_) > 1:
                            sls.append(slname)
                            if comutants:
                                sls[-1] += '_' + comutants

                    if sls:
                        mls[-1] += '/' + '-'.join(sls)

        depths = sorted(coverage.mean(include_margins=False)
                        for coverage in coverages.values())
        remark = ''

        if depths[len(depths) // 2] < 10:
            remark += ' -- low coverage (median below 10x)'

        mixed = sum(coverage.mixed() for coverage in coverages.values())
        if mixed:
            remark += ' -- mixed coverage'

        if not mls:
            return '?' + remark

        return ' // '.join(mls) + remark


comas09 = Reference('PLoS ONE 2009 - Comas (monomorphic)')
stucki12 = Reference('Stucki et al. PLoS ONE 2012')

lineage1 = Lineage('lineage 1', color='magenta',
                   origin='east africa, indian ocean, phillipines')
lineage2 = Lineage('lineage 2', color='blue', origin='TODO')
lineage_beijing = Lineage('beijing sublineage', lineage2)
lineage3 = Lineage('lineage 3', color='purple',
                   origin='east africa, central asia')
lineage4 = Lineage('lineage 4', color='red', origin='europe, america, africa')
lineage5 = Lineage('lineage 5', color='brown', origin='west africa 1')
lineage6 = Lineage('lineage 6', color='green', origin='west africa 2')
lineage7 = Lineage('lineage 7', color='yellow', origin='aethiopian')
lineage_animal = Lineage('animal lineage')

# (position, mutant base, lineage, reference) -- three markers per lineage
SNP_TABLE = [
    (3920109, 'T', lineage1, stucki12),
    (3597682, 'T', lineage1, stucki12),
    (1590555, 'T', lineage1, stucki12),
    (1834177, 'C', lineage2, stucki12),
    (3304966, 'A', lineage2, stucki12),
    (2711722, 'G', lineage2, comas09),
    (301341, 'A', lineage3, stucki12),
    (4266647, 'G', lineage3, stucki12),
    (157129, 'T', lineage3, comas09),
    (3326554, 'A', lineage4, stucki12),
    (2154724, 'C', lineage4, stucki12),
    (648856, 'T', lineage4, stucki12),
    (1377185, 'G', lineage5, stucki12),
    (801959, 'T', lineage5, stucki12),
    (2859147, 'T', lineage5, stucki12),
    (2427828, 'C', lineage6, stucki12),
    (378404, 'A', lineage6, stucki12),
    (4269522, 'A', lineage6, stucki12),
    (14806, 'C', lineage7, stucki12),
    (1663221, 'G', lineage7, stucki12),
    (497126, 'A', lineage7, stucki12),
    (3480645, 'G', lineage_animal, stucki12),
    (1427476, 'T', lineage_animal, stucki12),
    (3624593, 'T', lineage_animal, stucki12),
    (2112832, 'C', lineage_beijing, stucki12),
    (3587446, 'A', lineage_beijing, stucki12),
    (1849051, 'T', lineage_beijing, stucki12),
]

phylo = PhyloTestsuite(
    [Test(SNP(genome=ancestor, pos=pos, base=base), lineage, ref)
     for pos, base, lineage, ref in SNP_TABLE],
    VERSION)
