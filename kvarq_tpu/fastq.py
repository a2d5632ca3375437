'''
FastQ file model: vendor/PHRED variant inference, format validation, paired
files, quality-trim helpers and record-level random access.

Behavior matches reference kvarq/fastq.py (citations inline); implementation
is Python 3 with binary-safe file handling.
'''

import math
import gzip
import os.path
import collections

from kvarq_tpu.log import lo, tictoc


class FastqFileFormatException(Exception):
    pass


class Fastq:

    # printable PHRED alphabet chr(33)..chr(126) (reference fastq.py:41-42)
    ASCII = '!"#$%&\'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ' + \
            '[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~'

    VendorProperties = collections.namedtuple(
        'VendorProperties', ['Qrange', 'dQ'])

    # vendor variants with Q ranges and ASCII offsets (fastq.py:44-53)
    vendor_variants = dict((
        ('Sanger', VendorProperties(range(0, 50), 0)),
        ('Solexa', VendorProperties(range(-5, 41), 31)),
        ('Illumina 1.3+', VendorProperties(range(0, 41), 31)),
        ('Illumina 1.5+', VendorProperties(range(3, 42), 31)),
        ('Illumina 1.8+', VendorProperties(range(0, 62), 0)),
    ))

    def __init__(self, fname, variant=None, fd=None, paired=False, quiet=False):
        '''
        open ``.fastq`` or ``.fastq.gz`` file and determine its vendor
        variant, setting ``.Azero``/``.dQ`` accordingly (fastq.py:55-161)

        :param paired: include ``X_2.fastq`` when ``X_1.fastq`` is given
        '''
        self.fname = fname
        self.fd = fd if fd else None

        if self.fname.endswith('.fastq.gz'):
            self.gz = True
            if not self.fd:
                self.fd = gzip.GzipFile(self.fname, 'rb')
        elif self.fname.endswith('.fastq'):
            self.gz = False
            if not self.fd:
                self.fd = open(self.fname, 'rb')
        else:
            raise FastqFileFormatException(
                'fastq file must have extension ".fastq" or ".fastq.gz"')

        # detect second file of a paired set (fastq.py:90-98)
        self.fname2 = None
        if paired:
            base = fname[:fname.rindex('.fastq')]
            if base[-2:] == '_1':
                fname2 = base[:-2] + '_2' + fname[fname.rindex('.fastq'):]
                if os.path.exists(fname2):
                    lo.info('including paired file "%s"' % fname2)
                    self.fname2 = fname2

        if sum(self.filesizes()) == 0:
            raise FastqFileFormatException('cannot scan empty file')

        # sample some records to infer PHRED range
        min_pos, max_pos = self.min_max_score_check_file()
        lo.debug('min_pos=%d max_pos=%d' % (min_pos, max_pos))

        if variant and variant not in self.vendor_variants:
            raise FastqFileFormatException(
                'unknown vendor variant "%s"' % variant)

        # variants compatible with observed PHRED scores (fastq.py:111-138)
        variants = []
        dQs = []
        for name, vendor_variant in Fastq.vendor_variants.items():
            if ((min_pos - vendor_variant.dQ) in vendor_variant.Qrange
                    and (max_pos - vendor_variant.dQ) in vendor_variant.Qrange):
                dQs.append(vendor_variant.dQ)
                variants.append(name)

        if variant is None:
            if not variants:
                raise FastqFileFormatException(
                    'could not find any suitable fastq vendor variant')
            if len(set(dQs)) > 1:
                raise FastqFileFormatException(
                    'cannot determine dQ with guessed vendor variants "%s"'
                    % str(variants))
            self.variants = variants
            self.dQ = dQs[0]
        else:
            if variant not in variants:
                lo.warning('specified vendor variant "%s" seems not to be '
                           'compatible with file' % variant)
            self.variants = [variant]
            self.dQ = self.vendor_variants[variant].dQ

        self.Azero = self.ASCII[self.dQ]

        # estimate readlength / record count from first record (fastq.py:143-152)
        self.fd.seek(0)
        lines = [self._readline() for i in range(4)]
        self.readlength = len(lines[1].strip('\r\n'))
        if self.gz:
            self.records_approx = None
        else:
            self.records_approx = os.path.getsize(self.fname) // len(''.join(lines))
            if self.fname2 is not None:
                self.records_approx *= 2

        if not quiet:
            if self.gz:
                lo.info('gzipped fastq : readlength=? records_approx=? '
                        'dQ=%d variants=%s' % (self.dQ, str(self.variants)))
            else:
                lo.info('fastq : readlength=%d records_approx=%d dQ=%d '
                        'variants=%s' % (self.readlength, self.records_approx,
                                         self.dQ, str(self.variants)))

    def _readline(self):
        ''' read one line from the (binary) file handle as str '''
        return self.fd.readline().decode('latin-1')

    def filesizes(self):
        return [os.path.getsize(fname) for fname in self.filenames()]

    def filenames(self):
        if self.fname2 is not None:
            return [self.fname, self.fname2]
        return [self.fname]

    def min_max_score_check_file(self, n=1000, points=10):
        '''
        check fastq file format and return min/max PHRED score positions
        within :py:data:`ASCII`; samples ``n`` records at ``points`` spots
        (start only for gz) -- reference fastq.py:176-238
        '''
        ret_min = +999
        ret_max = -999
        self.fd.seek(0)

        if self.gz:
            lo.debug('gzipped fastq : scan %d points at start only' % n)

        identifier = None
        for point in range(points):

            if not self.gz and point > 0:
                # (oversamples small files)
                self.fd.seek(os.path.getsize(self.fname) * point // points)
                self.seekback()

            while n > (points - 1 - point) * n // points:
                identifier = self._readline().rstrip('\n\r')
                if not identifier:
                    break
                if not identifier[0] == '@':
                    raise FastqFileFormatException(
                        'identifier (1st line of record) must begin with "@"')
                bases = self._readline().rstrip('\n\r')
                if not set(bases).issubset(set('AGCTN')):
                    raise FastqFileFormatException(
                        'bases (2nd line of record) must contain only AGCTN')
                plus = self._readline().rstrip('\n\r')
                if not (plus == '+' or (plus[0] == '+'
                                        and plus[1:] == identifier[1:])):
                    raise FastqFileFormatException(
                        'separator (3rd line of record) must be == "+" or "+(ident)"')
                phredstr = self._readline().rstrip('\n\r')
                if not (len(bases) == len(phredstr) or (
                        len(bases) == len(phredstr) - 1 and phredstr[-1] == '!')):
                    raise FastqFileFormatException(
                        'bases must be ~ same length as phred score (2nd, 4th line)')
                try:
                    ret_min = min(ret_min, *[self.ASCII.index(x) for x in phredstr])
                    ret_max = max(ret_max, *[self.ASCII.index(x) for x in phredstr])
                except ValueError:
                    raise FastqFileFormatException(
                        'phred score (4th line of record) must contain only "%s"'
                        % self.ASCII)
                n -= 1

            if not identifier:
                break

        if not identifier:
            # only empty lines allowed after the first empty line
            while True:
                line = self._readline()
                if not line:
                    break
                if not line.rstrip('\r\n') == '':
                    raise FastqFileFormatException(
                        'non-empty line after empty line (fpos=%d' % self.fd.tell())

        return ret_min, ret_max

    def A2Q(self, A):
        ''' translate PHRED ASCII value to Q value '''
        return self.ASCII.index(A) - self.dQ

    def Q2A(self, Q):
        ''' inverse of A2Q() '''
        return self.ASCII[Q + self.dQ]

    def Q2p(self, Q):
        ''' translate PHRED Q value to probability '''
        return 10 ** (-.1 * Q)

    def p2Q(self, p):
        ''' inverse of Q2p() '''
        return int(-10 * math.log(p) / math.log(10))

    def lengths(self, Amin, n=1000, points=10):
        '''
        sample lengths of quality-trimmed records (fastq.py:263-293)
        '''
        self.fd.seek(0)

        if self.gz:
            lo.debug('gzipped fastq : scan %d points at start only' % n)

        lengths = []
        for point in range(points):

            if not self.gz and point > 0:
                self.fd.seek(os.path.getsize(self.fname) * point // points)
                self.seekback()

            while n > (points - 1 - point) * n // points:
                ident, seq, plus, scores = (self._readline().strip()
                                            for j in range(4))
                pos, length = self.cutoff(scores, Amin)
                if length >= 0:
                    lengths.append(length)

                n -= 1
        return lengths

    def cutoff(self, scores, Amin):
        ''' :returns: ``pos, length`` of the longest run of quality >= ``Amin``
            (first longest run wins; reference fastq.py:295-308) '''
        length = -1
        pos_ = pos = 0
        for j, A in enumerate(scores):
            if ord(A) >= ord(Amin):
                if pos < 0:
                    pos = j
            else:
                if pos >= 0 and length < j - pos:
                    length = j - pos
                    pos_ = pos
                pos = -1
        return pos_, length

    def readhit(self, hit):
        ''' :param hit: a :py:class:`kvarq_tpu.engine.Hit`
            :returns: the overlapping base string from the file '''
        if hit.seq_pos < 0:
            self.fd.seek(hit.file_pos - hit.seq_pos)
        else:
            self.fd.seek(hit.file_pos)
        return self.fd.read(hit.length).decode('latin-1')

    def lineup(self):
        ''' move file position to beginning of current line (or of previous
            line if already at a line start) '''
        pos = self.fd.tell()
        c = None
        while c != b'\n' and pos > 0:
            pos -= 1
            self.fd.seek(max(0, pos - 1))
            c = self.fd.read(1)
        if pos == 0:
            self.fd.seek(0)

    def seekback(self):
        ''' move file pointer to beginning of current/previous record '''
        l = pos = None
        while pos != 0:
            self.lineup()
            l = self.fd.readline()
            self.lineup()
            if l[0:1] == b'+':
                self.lineup()
                # previous + could be from quality score...
                l = self.fd.readline()
                self.lineup()
                if l[0:1] == b'+':
                    self.lineup()
                self.lineup()
                break
            pos = self.fd.tell()

    def readrecord(self):
        ''' read one record; ``fd`` must point at its first character '''
        ident, seq, plus, scores = (self._readline().strip()
                                    for j in range(4))
        return ident, seq, plus, scores

    def readrecordat(self, hit):
        ''' :returns: the four .fastq lines of the record containing ``hit`` '''
        self.fd.seek(hit.file_pos)
        self.seekback()
        ident, seq, plus, scores = self.readrecord()  # previous record
        ident, seq, plus, scores = self.readrecord()  # our record
        return '\n'.join([ident, seq, plus, scores]) + '\n'

    @tictoc('fastq.readhits')
    def readhits(self, hits):
        return [self.readhit(hit) for hit in hits]
