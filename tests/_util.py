import logging

from kvarq_tpu.log import lo


class NeedleHandler(logging.Handler):

    def __init__(self, needle, needle_level):
        logging.Handler.__init__(self, logging.DEBUG)
        self.needle = needle
        self.needle_level = needle_level
        self.found = False

    def handle(self, record):
        if self.needle_level is None or self.needle_level == record.levelno:
            if self.needle in record.getMessage():
                self.found = True


def lo_exceptor(needle, level=None, suppress=False):
    ''' returns a function asserting the given log message/level was seen;
        optionally suppresses other handlers until asserted '''
    levels = {}
    if suppress:
        for handler in lo.handlers:
            levels[handler] = handler.level
            handler.level = logging.FATAL

    needlehandler = NeedleHandler(needle, level)
    lo.addHandler(needlehandler)

    def lo_assert():
        msg = 'expected log message "%s"' % needle
        if level is not None:
            msg += ' (level %s)' % logging.getLevelName(level)
        assert needlehandler.found, msg

        lo.removeHandler(needlehandler)
        for handler in lo.handlers:
            handler.level = levels[handler]

    return lo_assert
