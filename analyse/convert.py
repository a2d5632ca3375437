#!/usr/bin/env python
'''
Standalone upgrade for "version 0" result files (the layout predating the
``info`` block: top-level ``spoligo``/``lineage`` keys and hit positions
that overflowed a signed int32 for files >2 GiB).  Prints the upgraded
json to stdout; later format versions pass through unchanged and are
handled by ``kvarq update`` (kvarq_tpu/legacy.py).  Behavior per reference
analyse/convert.py.
'''

import argparse
import json
import sys
import time

INT32_SPAN = 0x100000000


def unwrap_positions(posstr):
    ''' fix signed-int32 wraparound in a comma-joined position list;
        :returns: (fixed string, number of suspicious sign flips) '''
    fixed = []
    flips = 0
    previous = 0
    for pos in map(int, posstr.split(',')):
        if previous < 0 <= pos:
            flips += 1
        previous = pos
        fixed.append(pos + INT32_SPAN if pos < 0 else pos)
    return ','.join(map(str, fixed)), flips


def convert_v0(data, report=lambda msg: None):
    ''' in-place upgrade of a version-0 result dict to version 1 '''
    overflows = 0
    for test, posstr in data['hits'].items():
        data['hits'][test], flips = unwrap_positions(posstr)
        if flips:
            report('*** probable overflow in %s : %d sign flips'
                   % (test, flips))
            overflows += flips

    data['analyses'] = {key: data.pop(key)
                        for key in ('spoligo', 'lineage')}

    descr = 'converted 0->1 on ' + time.asctime(time.localtime())
    if overflows:
        descr += '; probably contains overflows that were not fixed'
    data['info'] = dict(format='kvarq', fastq='?', when='?', descr=descr)
    return data


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
        if args.verbose:
            sys.stderr.write('converting ' + args.json.name + '\n')
        convert_v0(data, report=lambda m: sys.stderr.write(m + '\n'))

    print(json.dumps(data, indent=2))


if __name__ == '__main__':
    main()
