'''
Two-phase testsuite loading (reference kvarq/testsuites.py):

1. :py:func:`discover_testsuites` finds candidate ``group/name`` -> path
   mappings in the usual places (package root, ``~/kvarq_testsuites``, CWD,
   ``$KVARQ_TESTSUITES``, explicit ``-t`` directories; later wins)
2. :py:func:`load_testsuites` (by selection) or
   :py:func:`update_testsuites` (by name+version, for .json files) actually
   execute the plugin files
'''

import os
import os.path
import time
from os.path import expanduser

from kvarq_tpu.versions import StrictVersion
from kvarq_tpu.util import get_root_path
from kvarq_tpu.log import lo
from kvarq_tpu import genes
from kvarq_tpu.analyse import TestsuiteVersionConflictException


def add_testsuites_dir(testsuite_paths, base):
    if not os.path.isdir(base):
        return

    for subdir in sorted(os.listdir(base)):

        if not os.path.isdir(os.path.join(base, subdir)) or (
                subdir[0] == '_' or subdir[0] == '.'):
            continue

        for fname in sorted(os.listdir(os.path.join(base, subdir))):

            if not fname.endswith('.py') or (
                    fname[0] == '_' or fname[0] == '.'):
                continue

            name = subdir + '/' + fname[:-3]
            path = os.path.join(base, subdir, fname)
            if name in testsuite_paths:
                lo.info('testsuite %s loaded from "%s"' % (name, path))
            else:
                lo.debug('testsuite %s loaded from "%s"' % (name, path))
            testsuite_paths[name] = path


def discover_testsuites(paths=[]):
    ''' map name -> python file for all testsuites in the usual places;
        later occurrences override previous '''
    testsuite_paths = {}

    # 1) package root path
    root_base = os.path.abspath(os.path.join(get_root_path(), 'testsuites'))
    lo.debug('discovering testsuites in root path')
    add_testsuites_dir(testsuite_paths, root_base)

    # 2) $HOME
    base = os.path.join(expanduser('~'), 'kvarq_testsuites')
    lo.debug('discovering testsuites in home directory')
    add_testsuites_dir(testsuite_paths, base)

    # 3) CWD (if different from root path)
    cwd_base = os.path.abspath('testsuites')
    if cwd_base != root_base:
        lo.debug('discovering testsuites in current working directory')
        add_testsuites_dir(testsuite_paths, cwd_base)

    # 4) KVARQ_TESTSUITES
    from_env = os.environ.get('KVARQ_TESTSUITES')
    if from_env:
        lo.debug('discovering testsuites in $KVARQ_TESTSUITES')
        for base in from_env.split(os.path.pathsep):
            add_testsuites_dir(testsuite_paths, base)

    # 5) explicitly specified paths
    for base in paths:
        if os.path.isdir(base):
            lo.debug('discovering testsuites in "%s"' % base)
            add_testsuites_dir(testsuite_paths, base)
        else:
            lo.warning('could not find directory "%s"' % base)

    return testsuite_paths


def load_testsuite(path):
    t0 = time.time()
    testsuite = genes.load_testsuite(path)
    lo.info('loaded testsuite from "%s" in %dms' % (
        path, int(1e3 * (time.time() - t0))))
    return testsuite


def load_get_testsuite(testsuites, name, testsuite_paths):
    ''' name can be full name or only filename part '''
    if name in testsuites:
        return testsuites[name]

    if name in testsuite_paths:
        return load_testsuite(testsuite_paths[name])

    for fullname, path in testsuite_paths.items():
        if fullname.split('/')[-1] == name:
            lo.info('mapping testsuite "%s" to "%s"' % (name, fullname))
            if fullname in testsuites:
                return testsuites[fullname]
            return load_testsuite(testsuite_paths[fullname])

    return None


def load_testsuites(testsuite_paths, selection, raise_exception=False):
    ''' load testsuites by full name, group name, or python file path '''
    testsuites = {}

    groups = {}
    for name, path in testsuite_paths.items():
        parts = name.split('/')
        groups.setdefault(parts[0], {})[name] = path

    for name_or_path in selection:

        try:

            if (os.path.isfile(name_or_path)
                    and name_or_path not in testsuite_paths
                    and name_or_path not in groups):

                # load from path
                parts = name_or_path.split(os.path.sep)
                name = os.path.splitext(parts[-1])[0]
                if len(parts) > 1:
                    name = parts[-2] + '/' + name
                testsuites[name] = load_testsuite(name_or_path)

            elif name_or_path in groups:

                for name, path in groups[name_or_path].items():
                    testsuites[name] = load_testsuite(path)

            else:

                name = name_or_path
                if name in testsuite_paths:
                    testsuites[name] = load_testsuite(testsuite_paths[name])
                else:
                    lo.warning('could not find testsuite "%s"' % name)

        except genes.TestsuiteLoadingException as e:
            if raise_exception:
                raise e
            lo.error('could not load testsuite from "%s" : %s'
                     % (name_or_path, e))

    return testsuites


def update_testsuites(testsuites, names_versions, testsuite_paths):
    ''' add testsuites (by possibly-short name) enforcing version
        compatibility: loaded version >= json version, same major
        (reference testsuites.py:180-220) '''
    for name, version in names_versions.items():

        testsuite = load_get_testsuite(testsuites, name, testsuite_paths)

        if testsuite is None:
            raise genes.TestsuiteLoadingException(
                'could not find testsuite "%s"' % name)

        v = StrictVersion(version)
        tv = StrictVersion(testsuite.version)

        if tv < v or tv.version[0] != v.version[0]:
            raise TestsuiteVersionConflictException(
                'incompatible versions testsuite "%s" : '
                'expected %s found %s' % (name, v, tv))

        testsuites[name] = testsuite
