'''
FastQ model tests (ported from reference tests/test_fastq.py): vendor/PHRED
variant inference, format violations, gz round trip.
'''

import gzip
import logging
import os

import pytest

from kvarq_tpu.fastq import Fastq, FastqFileFormatException
from kvarq_tpu.log import lo

from _util import lo_exceptor

TFASTQ = __file__ + '.fastq'


@pytest.fixture(params=[False, True], ids=['plain', 'gz'])
def write_fastq(request):
    gz = request.param

    def _write(content, variant=None):
        ntfn = TFASTQ
        if gz:
            ntfn += '.gz'
            with gzip.GzipFile(ntfn, 'w') as gzf:
                gzf.write(content.encode())
        else:
            with open(ntfn, 'w') as ntf:
                ntf.write(content)
        return Fastq(ntfn, variant=variant, quiet=True)

    yield _write
    for suffix in ['', '.gz']:
        if os.path.exists(TFASTQ + suffix):
            os.unlink(TFASTQ + suffix)


def write_quality(write_fastq, quality, variant=None):
    return write_fastq(
        '@IDENTIFIER\n' + 'A' * len(quality) + '\n+\n' + quality + '\n',
        variant=variant)


def test_fastq_variant(write_fastq):
    lo.setLevel(logging.WARNING)
    try:
        fq = write_quality(write_fastq,
                           '!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJ')
        assert fq.dQ == 0 and \
            set(fq.variants) == set(['Illumina 1.8+', 'Sanger'])

        fq = write_quality(write_fastq,
                           ';<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefgh')
        assert fq.dQ == 31 and fq.variants == ['Solexa']

        fq = write_quality(write_fastq, 'OPQRSTUVWXYZ[\\]^_`abcdefgh')
        assert fq.dQ == 31 and \
            fq.variants == ['Solexa', 'Illumina 1.3+', 'Illumina 1.5+']

        with pytest.raises(FastqFileFormatException):
            write_quality(write_fastq, ';<=>?@ABCDEFGHI;<=>?@ABCDEFGHI')

        # specifying a valid vendor variant resolves the ambiguity
        write_quality(write_fastq, ';<=>?@ABCDEFGHI;<=>?@ABCDEFGHI',
                      variant='Sanger')
        write_quality(write_fastq, ';<=>?@ABCDEFGHI;<=>?@ABCDEFGHI',
                      variant='Solexa')

        # an incompatible variant only warns
        lo_assert = lo_exceptor('seems not to be compatible',
                                logging.WARNING, True)
        write_quality(write_fastq, ';<=>?@ABCDEFGHI;<=>?@ABCDEFGHI',
                      variant='Illumina 1.3+')
        lo_assert()
    finally:
        lo.setLevel(logging.INFO)


def test_fastq_format(write_fastq):
    with pytest.raises(FastqFileFormatException):
        write_fastq('IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '+\n'
                    '############################################\n')

    with pytest.raises(FastqFileFormatException):
        write_fastq('@IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTAXGTACGTACGTACGTACGTACGT\n'
                    '+\n'
                    '############################################\n')

    with pytest.raises(FastqFileFormatException):
        write_fastq('@IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '+\n'
                    '#############################################\n')

    with pytest.raises(FastqFileFormatException):
        write_fastq('@IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '+text\n'
                    '############################################\n')

    with pytest.raises(FastqFileFormatException):
        write_fastq('@IDENTIFIER\n'
                    'ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT\n'
                    '+\n'
                    '############################################\n'
                    '\n'
                    '@IDENTIFIER\n')


def test_cutoff():
    fq = Fastq(os.path.join(os.path.dirname(__file__), 'fastqs',
                            'test_engine.fastq'), variant='Sanger',
               quiet=True)
    # first-longest run wins
    assert fq.cutoff('IIII!IIII', 'I') == (0, 4)
    assert fq.cutoff('!III!IIIII!', 'I') == (5, 5)
    assert fq.cutoff('!!!', 'I') == (0, 0)
