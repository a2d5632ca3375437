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


# --- headless widget-layer tests (faketk) -----------------------------------
#
# This environment has no X server and nothing may be installed, so the
# widget layer cannot run under a virtual display.  tests/faketk.py swaps
# tkinter for an in-memory double and re-imports the gui modules against
# it, so every application code path -- window construction, button
# callbacks, the timer-driven scan/poll loop, explorer listings, canvas
# plot drawing, background jobs -- executes for real.  (The reference
# never executed any of this: its tests/test_gui.py is a manual
# checklist.)

HERE = os.path.abspath(os.path.dirname(__file__))
MTBC_fastq = os.path.join(HERE, 'fastqs', 'N0116_1_hits_1k.fastq')

needs_genome = pytest.mark.skipif(
    not os.path.exists(os.path.join(
        HERE, os.pardir, 'testsuites', 'MTBC',
        'MTB_ancestor_reference.bases')),
    reason='run tools/reconstruct_genome.py first')


def _registry():
    from kvarq_tpu.testsuites import discover_testsuites
    return discover_testsuites(
        [os.path.join(HERE, os.pardir, 'testsuites')])


def test_headless_settings_dialog():
    import faketk
    from kvarq_tpu.config import default_config
    with faketk.installed():
        from kvarq_tpu.gui.settings import Settings

        config = dict(default_config)
        settings = Settings(config)
        settings.show()
        settings.entries['threads'].delete(0, 'end')
        settings.entries['threads'].insert(0, '3')
        settings.save_cb()
        assert config['threads'] == 3
        assert settings.win.destroyed

        # invalid value: error dialog, window stays, config unchanged
        settings.show()
        settings.entries['errors'].delete(0, 'end')
        settings.entries['errors'].insert(0, 'bogus')
        settings.save_cb()
        assert faketk.messagebox.calls[-1][0] == 'showerror'
        assert config['errors'] == default_config['errors']
        settings.cancel_cb()
        assert settings.win.destroyed


def test_headless_main_window():
    import faketk
    from kvarq_tpu.log import lo
    with faketk.installed():
        from kvarq_tpu.gui.main import MainGUI

        gui = MainGUI(testsuite_paths=_registry())
        try:
            # the live log pane receives kvarq log records, colored
            lo.info('hello from the test')
            lo.warning('and a warning')
            logged = gui.text.get()
            assert 'hello from the test' in logged
            assert '[WARNING]' in logged

            # action buttons exist; 'settings' opens the dialog
            buttons = [w for w in faketk.Widget.ALL
                       if isinstance(w, faketk.Button)]
            labels = [b.cget('text') for b in buttons]
            assert 'scan .fastq files' in labels
            assert 'explore .json files' in labels
            next(b for b in buttons
                 if b.cget('text') == 'settings').invoke()
            assert not gui.settings.win.destroyed
            gui.settings.cancel_cb()

            # closing asks for confirmation (recorded, answered yes)
            with pytest.raises(SystemExit):
                gui.invoke_protocol('WM_DELETE_WINDOW')
            assert faketk.messagebox.calls[-1][0] == 'askyesno'
        finally:
            lo.removeHandler(gui.log_handler)
            gui.destroy()


@needs_genome
def test_headless_scan_save_explore(tmp_path):
    ''' the full SimpleGUI flow: pick a fixture, tick MTBC/phylo, scan on
        the worker thread with the timer poll loop, save the result json,
        then explore it (listings + plot windows) -- all headless '''
    import json
    import time

    import faketk
    from kvarq_tpu.config import default_config
    from kvarq_tpu.log import lo
    lo.setLevel(logging.WARNING)
    registry = _registry()

    try:
        with faketk.installed():
            from kvarq_tpu.gui.settings import Settings
            from kvarq_tpu.gui.simple import SimpleGUI
            from kvarq_tpu.gui.explorer import (DirectoryExplorer,
                                                JsonExplorer)

            faketk.filedialog.askopenfilename = \
                lambda *a, **kw: (MTBC_fastq,)

            settings = Settings(dict(default_config))
            gui = SimpleGUI(settings, testsuites={},
                            testsuite_paths=registry)
            assert gui.fastqs == [MTBC_fastq]
            assert gui.start.cget('state') == 'normal'

            # no testsuite ticked: error dialog, nothing starts
            gui.start.invoke()
            assert faketk.messagebox.calls[-1][0] == 'showerror'
            assert not gui.running

            # tick MTBC/phylo and start the scan
            next(b for b in gui.selector.buttons
                 if b.cget('text') == 'MTBC/phylo').invoke()
            gui.start.invoke()
            assert gui.running

            deadline = time.time() + 300
            while gui.worker is not None and time.time() < deadline:
                faketk.pump(rounds=500)
            assert gui.worker is None, 'scan did not finish'
            assert gui.analysers, 'no analyser recorded'
            assert gui.show.cget('state') == 'normal'
            analyser = gui.analysers[MTBC_fastq]
            assert 'MTBC/phylo' in analyser.results

            # save the result through the dialog path
            jpath = tmp_path / 'result.json'
            fd = open(jpath, 'w')
            faketk.filedialog.asksaveasfile = lambda *a, **kw: fd
            gui.save_cb()
            fd.close()
            data = json.loads(jpath.read_text())
            assert data['info']['format'] == 'kvarq'
            assert 'MTBC/phylo' in data['analyses']

            # show results inline (analyser route into the explorer)
            gui.show_cb()

            # ...and re-load the saved file (decode route)
            explorer = JsonExplorer(str(jpath), testsuites={},
                                    testsuite_paths=registry)
            assert any('MTBC/phylo' in item
                       for item in explorer.alist.items)
            faketk.pump(rounds=5)   # poll() fills the coverage list
            explorer.alist.selection_set(0)   # 'info'
            faketk.pump(rounds=5)
            assert any(line.startswith('fastq :')
                       for line in explorer.clist.items)

            # open the three info plot windows (canvas drawing)
            for row, line in enumerate(explorer.clist.items):
                if line.endswith('...'):
                    explorer.clist.selection_set(row)
                    explorer.show_coverage(None)

            # coverage rows + coverage plot window
            explorer.alist.selection_set(1)
            explorer.refresh_coverages()
            assert len(explorer.clist.items) \
                == len(analyser.testsuites['MTBC/phylo'].tests)
            explorer.clist.selection_set(0)
            explorer.show_coverage(None)

            canvases = [w for w in faketk.Widget.ALL
                        if isinstance(w, faketk.Canvas)]
            assert canvases, 'plot windows created no canvas'
            for canvas in canvases:
                canvas.event_generate('<Configure>')
            assert any(canvas.items for canvas in canvases), \
                'plot windows drew nothing'

            # directory explorer over the saved json + csv summarize
            dx = DirectoryExplorer(str(tmp_path), testsuites={},
                                   testsuite_paths=registry)
            assert dx.jlist.items == ['result.json']
            dx.jlist.selection_set(0)
            errors_before = [c for c in faketk.messagebox.calls
                             if c[0] == 'showerror']
            dx.open_json()
            assert [c for c in faketk.messagebox.calls
                    if c[0] == 'showerror'] == errors_before, \
                'open_json raised: %r' % (faketk.messagebox.calls,)

            dx.summarize()

            def exported():
                # export_done fires the confirmation dialog last
                return any(c[0] == 'showinfo'
                           and 'csv' in str(c[1]) + str(c[2])
                           for c in faketk.messagebox.calls)
            deadline = time.time() + 60
            while not exported() and time.time() < deadline:
                faketk.pump(rounds=500, until=exported)
            assert exported(), faketk.messagebox.calls
            csvs = list(tmp_path.glob('results*.csv'))
            assert csvs and 'MTBC/phylo' in csvs[0].read_text()
    finally:
        lo.setLevel(logging.INFO)


def test_headless_plot_windows():
    ''' every plot window class draws onto its canvas '''
    import faketk
    with faketk.installed():
        from kvarq_tpu.gui import tkplot

        win = tkplot.ReadlengthWindow([0, 1, 5, 9, 12, 3] * 10)
        win2 = tkplot.HitHistogramWindow([3, 1, 4, 1, 5, 9, 2, 6])
        win3 = tkplot.SpoligoWindow([1, 0, 4] * 14 + [2])
        for w in (win, win2, win3):
            canvas = w.win.display.canvas
            canvas.event_generate('<Configure>')
            assert canvas.items, type(w).__name__
            # mouse-over readout must not raise, inside or outside
            canvas.event_generate('<Motion>', x=50, y=50)
            canvas.event_generate('<Motion>', x=0, y=0)


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


def test_coverage_window_draw_geometry():
    ''' CoverageWindow canvas output asserted item by item against
        independently computed geometry: depth bars, stacked mutation
        colors, red region-of-interest borders, dashed mean/mean+-std
        guides and the frame (reference kvarq/gui/tkplot.py:109-196) '''
    import faketk
    from kvarq_tpu.analyse import Coverage
    from kvarq_tpu.genes import Genotype, Reference, SNP, Test, Genome

    genome = Genome(os.path.join(os.path.dirname(__file__),
                                 'test_genes.bases'), identifier='toy')
    snp = SNP(genome=genome, pos=100, orig=genome.read(100, 1),
              base={'A': 'G'}.get(genome.read(100, 1), 'A'))
    test = Test(snp, Genotype('t'), Reference('r'))
    coverage = Coverage(snp.seq(spacing=5))
    n = len(coverage.coverage)
    assert n == 11          # 1 bp SNP + 5 bp flanks
    coverage.coverage = [0, 2, 5, 9, 9, 7, 9, 4, 3, 1, 0]
    coverage.mutations = {3: 'AAC', 5: 'T'}

    with faketk.installed():
        from kvarq_tpu.gui import tkplot

        win = tkplot.CoverageWindow(test, coverage)
        canvas = win.cd.canvas
        canvas.event_generate('<Configure>')

        # faketk canvases are 400x300; BarPlot margins are 20 all around
        W, H = 400, 300
        w, h = W - 40, H - 40
        flip = lambda y: H - 20 - y   # noqa: E731
        scale = min(3.0, float(h) / max(coverage.coverage))
        bx = lambda i: w * i // n     # noqa: E731

        rects = [it for it in canvas.items if it[0] == 'rectangle']
        lines = [it for it in canvas.items if it[0] == 'line']

        # 1. one gray depth bar per position, exact bounds
        bars = [r for r in rects if r[2].get('fill') == 'gray']
        assert len(bars) == n
        for i, (kind, coords, kw) in enumerate(bars):
            x0, bw = bx(i), bx(i + 1) - bx(i)
            assert coords == (20 + x0, flip(0), 20 + x0 + bw,
                              flip(int(coverage.coverage[i] * scale)))

        # 2. mutation stacks: sorted bases, stacked colors
        for i, muts in coverage.mutations.items():
            expect = []
            for j, base in enumerate(sorted(muts)):
                y0 = int(j * scale)
                expect.append((tkplot.CoverageDisplay.BASE_COLORS[base],
                               (20 + bx(i), flip(y0), 20 + bx(i + 1),
                                flip(int((j + 1) * scale)))))
            got = [(r[2]['fill'], r[1]) for r in rects
                   if r[1][0] == 20 + bx(i) and r[2].get('fill')
                   in ('blue', 'cyan', 'green', 'red', 'black')]
            assert got == expect, i

        # 3. red region-of-interest borders at start/stop (the flanks)
        red = [ln for ln in lines if ln[2].get('fill') == 'red']
        assert [ln[1] for ln in red] == [
            (20 + bx(coverage.start), flip(0),
             20 + bx(coverage.start), flip(h)),
            (20 + bx(coverage.stop), flip(0),
             20 + bx(coverage.stop), flip(h))]

        # 4. dashed mean / mean+-std guides at exact heights
        mean = coverage.mean(include_margins=False)
        std = coverage.std(include_margins=False)
        dashed = [ln for ln in lines if 'dash' in ln[2]]
        assert [(ln[1][1], ln[2]['dash']) for ln in dashed] == [
            (flip(int((mean - std) * scale)), (2, 5)),
            (flip(int(mean * scale)), (5, 3)),
            (flip(int((mean + std) * scale)), (2, 5))]

        # 5. frame rectangle around the plot area
        frame = [r for r in rects if r[2].get('outline') == 'black']
        assert frame and frame[-1][1] == (20, flip(0), 20 + w, flip(h))

        # 6. mouse-over readout text
        win.cd.motion(faketk.Event(widget=canvas, x=20 + bx(3) + 1,
                                   y=H // 2))
        assert 'coverage=9' in win.cd.label.kw['text']
        assert '2x A' in win.cd.label.kw['text']
        assert '1x C' in win.cd.label.kw['text']


def test_spoligo_window_draw_geometry():
    ''' SpoligoWindow bars item by item: 43 spacers, heights
        proportional to hit counts, zero margins left/right '''
    import faketk
    with faketk.installed():
        from kvarq_tpu.gui import tkplot

        data = [1, 0, 4] * 14 + [2]     # 43 spacers
        win = tkplot.SpoligoWindow(data)
        canvas = win.win.display.canvas
        canvas.event_generate('<Configure>')

        W, H = 400, 300
        w, h = W - 0 - 0, H - 40        # margins right/left zeroed
        flip = lambda y: H - 20 - y     # noqa: E731
        scale = float(h) / max(data)
        rects = [it for it in canvas.items if it[0] == 'rectangle']
        bars = [r for r in rects if r[2].get('fill') == 'gray']
        assert len(bars) == 43
        for i, (kind, coords, kw) in enumerate(bars):
            x0 = w * i // 43
            bw = w * (i + 1) // 43 - x0
            assert coords == (x0, flip(0), x0 + bw,
                              flip(int(data[i] * scale))), i
        assert win.win.display.describe(2) == 'spoligo2 : 4 hits'
