'''
High level interface to the scanning process: the :py:class:`Analyser`
drives the engine, maps hits into per-template :py:class:`Coverage`
structures and encodes/decodes the versioned ``.json`` result format.

Semantics and the serialized format match reference kvarq/analyse.py exactly
(citations inline), including the documented quirks (``std`` always sums the
full coverage array; mutation strings serialize base-sorted).
'''

import json
import codecs
import time
import os.path
from collections import OrderedDict

from kvarq_tpu import VERSION
from kvarq_tpu.log import lo, tictoc, format_traceback
from kvarq_tpu import engine
from kvarq_tpu import genes
from kvarq_tpu.fastq import Fastq
from kvarq_tpu.legacy import convert_legacy_data
from kvarq_tpu.config import default_config
from kvarq_tpu.versions import StrictVersion


class Coverage:
    '''
    Applies :py:class:`kvarq_tpu.engine.Hit` s to a template
    :py:class:`kvarq_tpu.genes.Sequence`, tracking per-position depth and
    alternate bases (reference analyse.py:25-186).

    ``coverage[i]`` is the depth at position ``i`` counted from the first
    base of the left flank; ``mutations`` maps position -> string of all
    alternate bases observed there; ``start``/``stop`` delimit the region
    of interest (the flank sizes).
    '''

    def __init__(self, plus_seq):
        self.plus_seq = plus_seq
        self.minus_seq = plus_seq.reverse()
        self.coverage = [0] * len(plus_seq)
        self.mutations = {}
        self.start = plus_seq.left
        self.stop = len(plus_seq) - plus_seq.right

    def apply_hit(self, hit, hitseq, on_plus_strand):
        ''' map one hit's bases onto the + strand and update depth/mutations
            (reference analyse.py:57-78) '''
        seq = self.plus_seq if on_plus_strand else self.minus_seq

        start = max(0, hit.seq_pos)
        stop = start + hit.length

        for i, j in enumerate(range(start, stop)):
            c_j = seq.plus_idx(j)
            c_b = seq.plus_base(hitseq[i])
            self.coverage[c_j] += 1
            if hitseq[i] != seq[j]:
                self.mutations[c_j] = self.mutations.get(c_j, '') + c_b

    def bases_at(self, idx):
        ''' {'A': n, ...} at position (including the template base) '''
        m = self.mutations.get(idx, '')
        ret = {self.plus_seq[idx]: self.coverage[idx] - len(m)}
        for b in set(m):
            ret[b] = m.count(b)
        return ret

    def fractions_at(self, idx):
        ''' OrderedDict base -> fraction, most prevalent first; ties broken
            template-base-first then alphabetically (deterministic, unlike
            the Python-2 reference's hash order) '''
        bases = self.bases_at(idx)
        total = sum(bases.values())
        return OrderedDict(sorted(
            [(b, n / float(max(1, total))) for b, n in bases.items()],
            key=lambda x: -x[1]))

    def minf(self, include_margins=False):
        ''' minimum (over positions) fraction of the dominant base '''
        if include_margins:
            start, stop = 0, len(self)
        else:
            start, stop = self.start, self.stop

        return min(next(iter(self.fractions_at(pos).values()))
                   for pos in range(start, stop))

    def mixed(self, fmin=0.9, include_margins=False):
        ''' whether coverage looks mixed: some covered position has its
            dominant base below ``fmin`` '''
        cminf = self.minf(include_margins=include_margins)
        return cminf > 0 and cminf < fmin

    def mean(self, include_margins=True):
        if include_margins:
            return sum(self.coverage) / float(len(self.coverage))
        return sum(self.coverage[self.start:self.stop]) / \
            float(self.stop - self.start)

    def std(self, include_margins=True):
        ''' standard deviation of depth.  Faithfully reproduces the
            reference quirk (analyse.py:134-144): the sum always runs over
            the *full* array regardless of ``include_margins``, and the
            mean is always the full-array mean. '''
        m = self.mean()
        return (sum((x - m) ** 2 for x in self.coverage)
                / len(self.coverage)) ** .5

    def seqmean(self):
        ''' mean depth of the region of interest *not* counting mutations '''
        seq = [self.coverage[i] - len(self.mutations.get(i, ''))
               for i in range(self.start, self.stop)]
        return sum(seq) / float(len(seq))

    def __str__(self):
        return '(mean %.2f std %.2f) ' % (self.mean(), self.std()) \
            + ' ' + self.serialize()

    def serialize(self):
        ''' the exact string format stored in .json files
            (reference analyse.py:157-164): '-'-joined depths, space,
            '-'-joined ``idx[sorted bases]`` entries '''
        cov = '-'.join(str(c) for c in self.coverage)
        mut = '-'.join('%d[%s]' % (idx, ''.join(sorted(self.mutations[idx])))
                       for idx in sorted(self.mutations.keys()))
        return cov + ' ' + mut

    def deserialize(self, serialized_coverage):
        c_s, space, m_s = serialized_coverage.partition(' ')
        self.coverage = [int(x) for x in c_s.split('-')]
        if m_s:
            self.mutations = dict(
                (int(x[:x.index('[')]), x[x.index('[') + 1:x.index(']')])
                for x in m_s.split('-'))
        else:
            self.mutations = {}

    def __len__(self):
        return len(self.coverage)

    def __getitem__(self, idx):
        return self.coverage[idx]


class DecodingException(Exception):
    ''' raised when :py:class:`Analyser` data cannot be decoded '''


class VersionConflictException(DecodingException):
    ''' file version incompatible with this KvarQ version '''


class TestsuiteVersionConflictException(DecodingException):
    ''' testsuite versions in .json incompatible with loaded testsuites '''


class DataInconcistencyException(DecodingException):
    ''' inconsistency in decoded data '''


class Analyser:

    '''
    Scan orchestration: ``scan()`` runs the engine and fills ``.coverages``,
    ``update_testsuites()`` produces ``.results``, ``encode()``/``decode()``
    round-trip everything through the versioned .json format
    (reference analyse.py:207-541).
    '''

    def __init__(self):
        self.config = None
        self.fastq = None
        self.fastq_filenames = None
        self.fastq_sizes = None
        self.fastq_readlength = None
        self.fastq_records_approx = None
        self.spacing = default_config['spacing']

        self.hits = None
        self.hitseqs = None
        self.stats = None
        self.scantime = 0
        self.coverages = None
        self.results = None

    def load_coverages(self, testsuites, spacing):
        ''' :returns: OrderedDict str(template) -> Coverage, flanks =
            ``spacing`` for dynamic templates; templates shared between
            testsuites dedupe by identifier (analyse.py:260-282) '''
        coverages = OrderedDict()
        for name, testsuite in testsuites.items():
            for test in testsuite.tests:
                if isinstance(test.template, genes.DynamicTemplate):
                    seq = test.template.seq(spacing=self.spacing)
                else:
                    seq = test.template.seq()
                coverages[str(test.template)] = Coverage(seq)
        return coverages

    def coverage_at(self, i):
        ''' coverage by scan index; indices >= len(coverages) refer to the
            reverse strand (analyse.py:284-294) '''
        n = len(self.coverages)
        if i >= n:
            i -= n
        return self.coverages[list(self.coverages.keys())[i]]

    def get_indexes(self, thing):
        ''' [forward_idx, reverse_idx] for a test/template name '''
        keys = list(self.coverages.keys())
        if isinstance(thing, genes.Test):
            idx1 = keys.index(str(thing.template))
        else:
            idx1 = keys.index(thing)
        return [idx1, idx1 + len(self.coverages)]

    def __len__(self):
        return len(self.coverages)

    def __getitem__(self, thing):
        if type(thing) == int:
            return self.coverage_at(thing)
        elif isinstance(thing, genes.Test):
            return self.coverages[str(thing.template)]
        else:
            return self.coverages[str(thing)]

    def scan(self, fastq, testsuites, do_reverse=True, keep_hits=True):
        ''' scan the fastq over the plus (and minus) template sequences and
            fill ``.coverages`` (reference analyse.py:328-365).

            With ``keep_hits`` (reference behavior) the engine materializes
            the full hit list (:py:func:`kvarq_tpu.engine.findseqs`) and
            ``.hits``/``.hitseqs`` are available for ``-H``/``--extract-hits``.
            With ``keep_hits=False`` the scan runs fully tensorized on
            device (:py:func:`kvarq_tpu.engine.countseqs`): coverage/mutation
            counts are accumulated on TPU with no host hit list -- much
            faster, with identical coverages, stats and analysis results. '''
        self.fastq = fastq
        self.fastq_filenames = fastq.filenames()
        self.fastq_sizes = fastq.filesizes()
        self.fastq_readlength = fastq.readlength
        self.fastq_records_approx = fastq.records_approx

        self.testsuites = testsuites
        self.coverages = self.load_coverages(testsuites, spacing=self.spacing)

        self.config = engine.get_config()

        seqs = [coverage.plus_seq.bases for coverage in self.coverages.values()]
        if do_reverse:
            seqs += [coverage.minus_seq.bases
                     for coverage in self.coverages.values()]

        t0 = time.time()
        if keep_hits:
            ret = engine.findseqs(self.fastq.filenames(), seqs)
            lo.debug('found %d hits' % len(ret['hits']))
            self.stats = ret['stats']
            self.hits = ret['hits']
            self.hitseqs = ret['hitseqs']
            self.scantime = time.time() - t0
            self.update_coverages()
        else:
            from kvarq_tpu.engine.tensor_scan import fold_into_coverage
            ret = engine.countseqs(self.fastq.filenames(), seqs)
            self.stats = ret['stats']
            self.hits = None
            self.hitseqs = None
            n = len(self.coverages)
            bcs = ret['basecounts']
            for i, coverage in enumerate(self.coverages.values()):
                fold_into_coverage(
                    coverage, bcs[i], bcs[n + i] if do_reverse else None)
            self.scantime = time.time() - t0

    @tictoc('update_coverages')
    def update_coverages(self):
        ''' apply ``.hits`` to ``.coverages`` (strand demultiplexed by
            ``seq_nr``, analyse.py:368-381) '''
        assert self.hits is not None, 'cannot update coverages without .hits'
        assert self.hitseqs is not None, \
            'cannot update coverages without .hitseqs'
        assert self.fastq is not None, 'cannot update coverages without .fastq'

        for hit, hitseq in zip(self.hits, self.hitseqs):
            coverage = self.coverage_at(hit.seq_nr)
            coverage.apply_hit(hit, hitseq,
                               hit.seq_nr < len(self.coverages))

    def update_testsuites(self):
        ''' create ``.results`` from every testsuite, trapping per-testsuite
            errors into 'ERROR : ...' strings (analyse.py:384-395) '''
        import sys
        self.results = {}
        for name, testsuite in self.testsuites.items():
            try:
                self.results[name] = testsuite.analyse(self)
            except Exception as e:
                lo.error('testsuite "%s" : %s [%s]' % (
                    name, e, format_traceback(sys.exc_info())))
                self.results[name] = 'ERROR : ' + str(e)

    @tictoc('encode')
    def encode(self, hits=False):
        ''' json-able dict: analyses/info/stats/coverages[/hits,hitseqs]
            (analyse.py:397-435) '''
        more = {}
        if hits:
            more['hits'] = self.hits
            more['hitseqs'] = self.hitseqs

        return dict(
            analyses=self.results,
            info={
                'format': 'kvarq',
                'fastq': self.fastq_filenames,
                'size': self.fastq_sizes,
                'readlength': self.fastq_readlength,
                'records_approx': self.fastq_records_approx,
                'scantime': self.scantime,
                'when': time.asctime(time.localtime()),
                'version': VERSION,
                'config': self.config,
                'spacing': self.spacing,
                'testsuites': dict((name, testsuite.version)
                                   for name, testsuite in
                                   self.testsuites.items()),
            },
            stats=self.stats,
            coverages=[(name, coverage.serialize())
                       for name, coverage in self.coverages.items()],
            **more)

    @tictoc('decode')
    def decode(self, testsuites, data):
        ''' restore attributes from :py:meth:`encode` output, with legacy
            format conversion and per-testsuite version gates
            (analyse.py:438-534) '''
        data = convert_legacy_data(testsuites, data)

        self.config = data['info']['config']
        self.fastq_filenames = data['info']['fastq']
        self.fastq_sizes = data['info']['size']
        self.fastq_readlength = data['info'].get('readlength', -1)
        self.fastq_records_approx = data['info'].get('records_approx', -1)
        self.stats = data['stats']
        self.scantime = data['info'].get('scantime', -1)

        if 'hits' in data:
            self.hits = [engine.Hit(*hit) for hit in data['hits']]
        else:
            self.hits = None

        self.hitseqs = data.get('hitseqs')

        if os.path.isfile(self.fastq_filenames[0]):
            lo.info('found .fastq file : ' + self.fastq_filenames[0])
            self.fastq = Fastq(self.fastq_filenames[0])
        else:
            lo.info('cannot load .fastq file : ' + self.fastq_filenames[0])
            self.fastq = None

        # testsuite version gates: json <= loaded, same major
        self.testsuites = {}
        for name, version in data['info']['testsuites'].items():
            if name in testsuites:
                testsuite = testsuites[name]
                json_v = StrictVersion(version)
                kvarq_v = StrictVersion(testsuite.version)

                if json_v > kvarq_v or \
                        json_v.version[0] != kvarq_v.version[0]:
                    raise TestsuiteVersionConflictException(
                        'version conflict testsuite "%s" : .json version '
                        '"%s" not compatible with current version "%s"' %
                        (name, version, testsuite.version))

                lo.debug('loading testsuite %s (%s)' % (name, str(testsuite)))
                self.testsuites[name] = testsuite
            else:
                lo.warning('testsuite "%s" not loaded -> ignoring some '
                           'results in .json file' % name)

        templates = dict()
        for testsuite in testsuites.values():
            for test in testsuite.tests:
                templates[str(test.template)] = test.template

        self.spacing = data['info']['spacing']
        self.coverages = OrderedDict()
        for name, serialized_coverage in data['coverages']:
            if name not in templates:
                # newer testsuites may have discarded tests
                continue

            template = templates[name]
            if isinstance(template, genes.DynamicTemplate):
                seq = template.seq(spacing=self.spacing)
            else:
                seq = template.seq()

            coverage = Coverage(seq)
            coverage.deserialize(serialized_coverage)
            self.coverages[name] = coverage

    @tictoc('extract_hits')
    def extract_hits(self, fname):
        ''' write the full FastQ records of all hits to ``fname`` '''
        with open(fname, 'w') as out:
            for hit in self.hits:
                out.write(self.fastq.readrecordat(hit))


class AnalyserJson:

    ''' helper to validate/load .json files created by Analyser.encode()
        (reference analyse.py:543-574) '''

    def __init__(self, jpath, minver=None):
        try:
            self.data = json.load(codecs.open(jpath, encoding='utf-8'))
        except ValueError as e:
            raise DecodingException('not valid .json format : ' + str(e))

        if 'info' not in self.data:
            raise DecodingException(
                'not valid file format : "info" key missing')
        if 'format' not in self.data['info'] or \
                not self.data['info']['format'] == 'kvarq':
            raise DecodingException(
                'not valid file format : "info"/"format" != "kvarq"')

        if minver:
            minver = StrictVersion(minver)
            dataversion = StrictVersion(self.data['info']['version'])
            if dataversion < minver:
                raise VersionConflictException(
                    '.json format too old : %s < %s' % (dataversion, minver))

    @property
    def analyses(self):
        return self.data['analyses'].items()
