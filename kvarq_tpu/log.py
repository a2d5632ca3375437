'''
Central logging for kvarq_tpu: a single ``logging.getLogger('kvarq')`` with
colored stderr output plus lightweight ``tic``/``toc`` phase timers
(behavior-compatible with reference kvarq/log.py).
'''

import logging
import sys
import traceback
import time
import functools
import re


class ColoredFormatter(logging.Formatter):

    def format(self, record):
        ret = super().format(record)

        reset = '\033[m'
        bold = '\033[1m'
        ok = '\033[92m'          # fg=green
        error = '\033[97;101m'   # fg=white bg=red

        m = re.match('(\\[.*?\\] )(-INFO-)( .*)', ret)
        if m:
            return m.group(1) + ok + m.group(2) + reset + m.group(3)
        m = re.match('(\\[.*?\\] )(-WARNING-|-ERROR-)( .*)', ret)
        if m:
            return m.group(1) + error + m.group(2) + reset + bold + m.group(3) + reset

        return ret


lo = logging.getLogger('kvarq')
ft = logging.Formatter('[%(asctime)s] -%(levelname)s- '
                       '%(filename)s:%(lineno)d(%(funcName)s) :: %(message)s')
cft = ColoredFormatter('[%(asctime)s] -%(levelname)s- '
                       '%(filename)s:%(lineno)d(%(funcName)s) :: %(message)s')

logfn = None  # use this to check whether log goes to file
ch = logging.StreamHandler(sys.stderr)
if sys.platform != 'win32' and hasattr(sys.stderr, 'isatty') and sys.stderr.isatty():
    ch.setFormatter(cft)
else:
    ch.setFormatter(ft)

lo.setLevel(logging.INFO)
ch.setLevel(logging.DEBUG)
lo.addHandler(ch)


def set_debug():
    lo.setLevel(logging.DEBUG)


def set_info():
    lo.setLevel(logging.INFO)


def set_warning():
    lo.setLevel(logging.WARNING)


def appendlog(fname):
    fh = logging.FileHandler(fname)
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(ft)
    lo.addHandler(fh)


tictocs = {}


def tic(name):
    tictocs.setdefault(name, []).append([time.time()])


def toc(name):
    l = tictocs[name][-1]
    l.append(time.time())
    lo.debug('toc-tic %s : %.2f ms' % (name, 1e3 * (l[1] - l[0])))


def tictoc(name):
    ''' decorator logging wall time of every call at debug level '''
    def decorator(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            tic(name)
            ret = f(*args, **kwargs)
            toc(name)
            return ret
        return wrapper
    return decorator


def format_traceback(exc_info):
    return ' -> '.join([
        '%s:%d' % (frame[0], frame[1])
        for frame in traceback.extract_tb(exc_info[2])])
