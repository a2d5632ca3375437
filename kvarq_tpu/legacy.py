'''
Conversion of .json result files written by older KvarQ versions
(reference kvarq/legacy.py): v0.10 (tests/testsuites keyed) and v0.11
(scalar info.fastq/size) are upgraded to the current coverages-keyed,
list-valued format.
'''

from functools import reduce
from collections import OrderedDict

from kvarq_tpu import VERSION
from kvarq_tpu.log import lo
from kvarq_tpu.versions import StrictVersion


def convert_legacy_data(testsuites, data):
    '''
    :param testsuites: dictionary of :py:class:`kvarq_tpu.genes.Testsuite`
    :param data: dict as returned by Analyser.encode(), possibly from a
        previous version
    :returns: dict in the current format

    raises VersionConflictException / DataInconcistencyException when the
    data cannot be converted.
    '''
    from kvarq_tpu.analyse import (VersionConflictException,
                                   DataInconcistencyException)

    kvarq_version = list(StrictVersion(VERSION).version)
    version = list(StrictVersion(data['info']['version']).version)

    if version[1] < 10:
        raise VersionConflictException('cannot load files v<0.10')

    # convert tests -> coverages (v0.10 -> v0.11, reference legacy.py:21-77)
    if version[0] == 0 and version[1] == 10:

        templates_by_testname = dict(reduce(lambda x, y: x + y, [[
            (str(test), test.template) for test in testsuite.tests
        ] for testsuite in testsuites.values()]))

        coverages_by_testname = dict(reduce(
            lambda x, y: x + y,
            [list(data_testsuite.items())
             for data_testsuite in data['testsuites'].values()]))

        nrmap = []
        coverages = OrderedDict()

        for i, testname in enumerate(data['tests']):

            if testname not in templates_by_testname:
                lo.info('json contains additional test "%s"; discarding.'
                        % testname)
                continue

            templatename = str(templates_by_testname[testname])
            coverage = coverages_by_testname[testname]

            if templatename in coverages:
                if coverages[templatename] != coverage:
                    raise DataInconcistencyException(
                        'found contradicting coverages for template "%s" : '
                        '"%s" / "%s"' % (templatename,
                                         coverages[templatename], coverage))
            else:
                coverages[templatename] = coverage
                nrmap.append(i)

        data['coverages'] = [(k, v) for k, v in coverages.items()]
        lo.debug('mapping "nseqhits", "nseqbasehits" : (%d) %s'
                 % (len(nrmap), str(nrmap)))
        for key in ['nseqhits', 'nseqbasehits']:
            if key not in data['stats']:
                lo.info('no stats/%s found (old json version)' % key)
                continue
            data['stats'][key] = [
                data['stats'][key][nrmap[coveragenr]]
                for coveragenr in range(len(coverages))  # forward
            ] + [
                data['stats'][key][nrmap[coveragenr] + len(data['tests'])]
                for coveragenr in range(len(coverages))  # reverse
            ]

        del data['testsuites']
        del data['tests']
        version[1] += 1

    # convert info.fastq/info.size to lists (v0.11 -> v0.12)
    if version[0] == 0 and version[1] == 11:
        data['info']['fastq'] = [data['info']['fastq']]
        data['info']['size'] = [data['info']['size']]
        version[1] += 1

    if not (version[0] == kvarq_version[0] and version[1] == kvarq_version[1]):
        raise VersionConflictException(
            'could not elevate version more than to "%d.%d"'
            % (version[0], version[1]))

    return data
