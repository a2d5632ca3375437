'''
Utility tests (ported from reference tests/test_util.py TextHist cases,
plus json_dump format checks).
'''

import io
import json

from kvarq_tpu.util import TextHist, json_dump


def test_texthist():
    # min bin width is 1
    hist = TextHist().draw(sorted([0, 0, 1]), indexed=False)
    assert '100%' in hist
    hist = TextHist().draw(sorted([0, 0, 2]), indexed=False)
    assert '66%' in hist
    # all zero
    hist = TextHist().draw(sorted([0, 0, 0]), indexed=False)
    assert 'CANNOT' in hist
    # zero width bin
    hist = TextHist().draw(sorted([1, 1, 1]), indexed=False)
    assert 'CANNOT' in hist
    # no data
    hist = TextHist().draw(sorted([]), indexed=False)
    assert 'CANNOT' in hist


def test_json_dump_roundtrip():
    data = dict(
        analyses={'phylo': 'lineage 3'},
        info={'format': 'kvarq', 'fastq': ['a.fastq'], 'size': [123]},
        coverages=[['SNP1G T', '1-2-3 ']],
    )
    buf = io.StringIO()
    json_dump(data, buf)
    assert json.loads(buf.getvalue()) == data
    # top two levels are indented, deeper levels are single-line
    assert '"analyses": {' in buf.getvalue()
