'''
GUI tests: the display-independent logic (file pairing, histogram binning,
log-line splitting, settings validation, explorer row/info formatting) is
tested everywhere; actual widget construction runs only when a display is
available.  (The reference's tests/test_gui.py was an interactive manual
checklist.)
'''

import logging
import os

import pytest


def _has_display():
    import tkinter
    try:
        t = tkinter.Tk()
        t.destroy()
        return True
    except Exception:
        return False


def test_imports():
    import kvarq_tpu.gui.util           # noqa: F401
    import kvarq_tpu.gui.settings       # noqa: F401
    import kvarq_tpu.gui.tkplot         # noqa: F401
    import kvarq_tpu.gui.main           # noqa: F401
    import kvarq_tpu.gui.simple         # noqa: F401
    import kvarq_tpu.gui.explorer       # noqa: F401
    # reference-compatible alias package
    import kvarq.gui.main
    import kvarq_tpu.gui.main as m
    assert kvarq.gui.main is m


def test_pair_fastqs():
    ''' _1/_2 pair merging (reference gui/simple.py:166-199) '''
    from kvarq_tpu.gui.simple import pair_fastqs

    fastqs, paireds = pair_fastqs(['b_2.fastq', 'b_1.fastq', 'a.fastq'])
    assert fastqs == ['a.fastq', 'b_1.fastq']
    assert paireds[:len(fastqs)] == [False, True]

    fastqs, paireds = pair_fastqs(['x_1.fastq', 'y_2.fastq'])
    assert fastqs == ['x_1.fastq', 'y_2.fastq']
    assert paireds[:len(fastqs)] == [False, False]

    fastqs, paireds = pair_fastqs(['c_1.fastq.gz', 'c_2.fastq.gz'])
    assert fastqs == ['c_1.fastq.gz']
    assert paireds[:len(fastqs)] == [True]

    # a pair followed by an unrelated file
    fastqs, paireds = pair_fastqs(['a_1.fastq', 'a_2.fastq', 'a_3.fastq'])
    assert fastqs == ['a_1.fastq', 'a_3.fastq']
    assert paireds[:2] == [True, False]


def test_histogram_binning():
    from kvarq_tpu.gui.tkplot import histogram_bins, nice_bin_width

    bins, bw = histogram_bins([1, 1, 2, 4, 5, 3, 3, 1], indexed=True,
                              nbins=4)
    assert bw >= 1
    assert sum(bins) == 20

    bins, bw = histogram_bins([3, 1, 4, 1, 5, 9, 2, 6], indexed=False,
                              nbins=4)
    assert sum(bins) == 8

    assert nice_bin_width(0) == 1.
    assert nice_bin_width(0.03) == 1.
    assert nice_bin_width(137.2) == 130


def test_split_log_line():
    from kvarq_tpu.gui.main import split_log_line
    assert split_log_line('[INFO] hello') == ('[INFO]', ' hello')
    assert split_log_line('no tag here') == ('', 'no tag here')


def test_parse_int_settings():
    from kvarq_tpu.gui.settings import parse_int_settings
    values, bad = parse_int_settings({'threads': '8', 'errors': '2'})
    assert bad is None and values == {'threads': 8, 'errors': 2}
    values, bad = parse_int_settings({'threads': '8', 'errors': 'x'})
    assert values is None and bad == 'errors'


def test_resolve_extent():
    from kvarq_tpu.gui.util import resolve_extent
    assert resolve_extent(300, 1000, 200, 900) == 300
    assert resolve_extent(-200, 1000, 200, 900) == 800
    assert resolve_extent(0.5, 1000, 200, 900) == 500
    assert resolve_extent(5000, 1000, 200, 900) == 900


def test_explorer_helpers(tmp_path):
    from kvarq_tpu.gui.explorer import (human_sort_key, summary_line,
                                        unique_csv_name,
                                        decoding_error_text)
    from kvarq_tpu.analyse import TestsuiteVersionConflictException

    # natural ordering: rpoB.H445D style keys sort numerically
    keys = ['x10', 'x2', 'x1']
    assert sorted(keys, key=human_sort_key) == ['x1', 'x2', 'x10']

    assert summary_line('phylo', 'lineage 3') == 'phylo: lineage 3'
    assert summary_line('r', ['a', 'b']) == 'r: a; b'

    first = unique_csv_name(str(tmp_path))
    assert first.endswith('results.csv')
    open(first, 'w').close()
    assert unique_csv_name(str(tmp_path)).endswith('results2.csv')

    text = decoding_error_text(
        'f.json', TestsuiteVersionConflictException('boom'))
    assert 'f.json' in text and 'compatible versions' in text


def test_coverage_row_formatting():
    ''' explorer coverage rows against a real scanned coverage '''
    from kvarq_tpu.analyse import Coverage
    from kvarq_tpu.genes import Genotype, Reference, SNP, Test, Genome
    from kvarq_tpu.gui.explorer import (coverage_markers,
                                        format_coverage_row)

    genome = Genome(os.path.join(os.path.dirname(__file__),
                                 'test_genes.bases'), identifier='toy')
    snp = SNP(genome=genome, pos=100, orig=genome.read(100, 1),
              base={'A': 'G'}.get(genome.read(100, 1), 'A'))
    test = Test(snp, Genotype('t'), Reference('r'))
    coverage = Coverage(snp.seq(spacing=5))

    # empty coverage: not validated, not mixed
    assert coverage_markers(test, coverage) == ''
    row = format_coverage_row(test, coverage, None, [])
    assert str(test) in row and 'mean' in row

    # deep clean coverage: validated
    for i in range(len(coverage.coverage)):
        coverage.coverage[i] = 10
    assert '+' in coverage_markers(test, coverage)

    row = format_coverage_row(test, coverage, [3, 4], [0, 1])
    assert '7 hits' in row


def test_gui_log_handler_offline():
    ''' GuiLogHandler.emit against a minimal fake Text widget '''
    import tkinter  # noqa: F401  (import only; no window)
    from kvarq_tpu.gui import main as gui_main

    class FakeText:
        def __init__(self):
            self.chunks = []

        def tag_config(self, *a, **k):
            pass

        def config(self, **k):
            pass
        configure = config

        def insert(self, where, text, tags=()):
            self.chunks.append((text, tuple(tags)))

    class FakeFont:
        def __init__(self, *a, **k):
            pass

    handler = object.__new__(gui_main.GuiLogHandler)
    logging.Handler.__init__(handler, level=logging.DEBUG)
    text = FakeText()
    handler.text = text
    handler.scrollfn = lambda: None
    handler.fmt = logging.Formatter('[%(levelname)s] %(message)s')

    record = logging.LogRecord('kvarq', logging.WARNING, 'f.py', 1,
                               'watch out', (), None)
    handler.emit(record)
    texts = ''.join(chunk for chunk, _ in text.chunks)
    assert '[WARNING]' in texts and 'watch out' in texts
    assert any('alert' in tags for _, tags in text.chunks)


@pytest.mark.skipif(not _has_display(), reason='no display')
def test_widgets_construct(tmp_path):
    from kvarq_tpu.gui.util import ThemedTk
    from kvarq_tpu.gui.settings import Settings
    from kvarq_tpu.config import default_config

    win = ThemedTk(title='test', geometry=(300, 200))
    win.destroy()

    s = Settings(dict(default_config))
    s.show()
    s.win.destroy()
