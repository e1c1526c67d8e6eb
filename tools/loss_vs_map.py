#!/usr/bin/env python
"""Plot training loss vs per-snapshot mAP from log files.

Rebuild of /root/reference/tools/loss_vs_map.py:32-95 — the parsing treats
the log format as an API: ``json_stats: {...}`` lines carry the loss,
``Single Query:  [mAP: xx.xx%]`` lines carry the evaluator results (tested
newest-first by tools/train_net.py, so the mAP list is reversed).
Matplotlib is optional; without it the parsed series are printed.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))


import argparse
import glob
import json
import os
import re


def get_loss(log_path):
    loss_values, iter_values, snapshot_values = [], [], []
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if re.search(r'model_final\.pkl', line):
                break
            m = re.search(r'model_epoch([0-9]+)\.pkl', line)
            if m:
                snapshot_values.append(float(m.group(1)))
            m = re.search(r'json_stats: (\{.*\})', line)
            if m:
                stats = json.loads(m.group(1))
                if 'loss' in stats:
                    loss_values.append(float(stats['loss']))
                    iter_values.append(stats.get('iter', len(iter_values)))
    return loss_values, iter_values, sorted(set(snapshot_values))


def get_map(log_path):
    map_values = []
    with open(log_path) as f:
        for line in f:
            # anchored: 'Re-ranked Single Query:' lines must NOT match
            m = re.match(r'Single Query:\s+\[mAP: ([0-9.]+)%\]',
                         line.strip())
            if m:
                map_values.append(float(m.group(1)))
    if not map_values:
        return None, []
    # final model first, then snapshots newest-first (train_net.py order)
    return map_values[0], map_values[1:][::-1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--output-dir', default='.')
    parser.add_argument('--log', default=None)
    args = parser.parse_args()

    logs = [args.log] if args.log else sorted(
        glob.glob(os.path.join(args.output_dir, '*.log')))
    if not logs:
        print('no logs found in', args.output_dir)
        return
    log = logs[-1]
    losses, iters, snapshots = get_loss(log)
    final_map, snap_maps = get_map(log)
    print('parsed {}: {} loss points, final mAP {}, {} snapshot mAPs'.format(
        log, len(losses), final_map, len(snap_maps)))
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
    except ImportError:
        print('matplotlib unavailable; skipping plot')
        return
    fig, ax1 = plt.subplots()
    ax1.plot(iters, losses, 'b-', label='loss')
    ax1.set_xlabel('iter')
    ax1.set_ylabel('loss', color='b')
    if snap_maps:
        ax2 = ax1.twinx()
        xs = [i * (iters[-1] if iters else 1) / max(len(snap_maps), 1)
              for i in range(1, len(snap_maps) + 1)]
        ax2.plot(xs, snap_maps, 'r.-', label='mAP')
        ax2.set_ylabel('mAP %', color='r')
    out = os.path.splitext(log)[0] + '_loss_vs_map.png'
    plt.savefig(out, dpi=120)
    print('wrote', out)


if __name__ == '__main__':
    main()
