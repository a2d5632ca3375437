#!/usr/bin/env python
'''
Converts a ``.json`` result file from one format version to another
(reference analyse/convert.py): upgrades the pre-0.10 "version 0" layout
(top-level ``spoligo``/``lineage`` keys, signed-overflowed hit positions)
to the ``info``-keyed version 1 layout.  Later upgrades (0.10/0.11 ->
current) are handled transparently by ``kvarq update``
(kvarq_tpu/legacy.py).
'''

import argparse
import json
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(
        description='converts .json from one version to another')
    parser.add_argument('-v', '--verbose', action='store_true',
                        help='print some information to stderr')
    parser.add_argument('json', type=argparse.FileType('r'),
                        help='name of .json file to process')
    args = parser.parse_args(argv)

    data = json.load(args.json)

    if 'info' not in data:
        # convert version 0 -> version 1
        if args.verbose:
            sys.stderr.write('converting ' + args.json.name + '\n')

        overflow = 0
        for test, posstr in data['hits'].items():
            poss = []
            lpos = 0
            for pos in map(int, posstr.split(',')):
                if lpos < 0 and pos >= 0:
                    sys.stderr.write(
                        '*** probable overflow in %s : %d -> %d\n'
                        % (test, lpos, pos))
                    overflow += 1
                lpos = pos
                if pos < 0:
                    # file positions >2 GiB stored in a signed int32
                    pos = (pos - (-2147483648)) + 0x80000000
                poss.append(pos)
            data['hits'][test] = ','.join(map(str, poss))

        data['analyses'] = {
            'spoligo': data['spoligo'],
            'lineage': data['lineage'],
        }
        del data['spoligo']
        del data['lineage']

        descr = 'converted 0->1 on ' + time.asctime(time.localtime())
        if overflow > 0:
            descr += '; probably contains overflows that were not fixed'
        data['info'] = {
            'format': 'kvarq',
            'fastq': '?',
            'when': '?',
            'descr': descr,
        }

    print(json.dumps(data, indent=2))


if __name__ == '__main__':
    main()
