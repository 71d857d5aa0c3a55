#!/usr/bin/env python3
"""Assemble the committed artifacts/CORRECTNESS_sf10.json from the sf10
oracle sweeps.

The sf10 surface is measured incrementally across sweep runs (the DuckDB
oracle at sf10 takes hours and individual oracles need solo retries with
raised memory limits), so the full-surface verdict is the UNION of the
sweep jsons, all measured against the same engine dump directory
(/tmp/graft/verify_sf10). A sweep entry is only eligible for the union if
no file in its dump dir is newer than the sweep json that measured it —
freshness is enforced here, not assumed.

Steps:
 1. Union the sweep jsons oldest-first (newest measurement wins per key),
    dropping entries whose dump changed after measurement.
 2. merge_correctness over the union with the r13 artifact as carry for
    named engine-side dispositions.
 3. Post-process the known oracle-side host limits into named dispositions
    (compare attempted + resource-limited on host; engine output dumped and
    oracled green at sf0.01/0.1/1).
"""
import glob
import json
import os
import subprocess
import sys
from collections import Counter

DUMP_DIR = '/tmp/graft/verify_sf10'
# Oldest-first: later files override earlier ones per key.
SWEEPS = [
    '/tmp/graft/sweep10_oracle.json',
    '/tmp/graft/sweep10_oracle_r14.json',
    '/tmp/graft/sweep10_oracle_r15.json',  # optional: this round's retries
]
UNION = '/tmp/graft/sweep10_union.json'
OUT = '/root/repo/artifacts/CORRECTNESS_sf10.json'


def dump_mtime(key):
    d = os.path.join(DUMP_DIR, key)
    return max((os.path.getmtime(p) for p in glob.glob(d + '/*')), default=0)


def main():
    union = {}
    for path in SWEEPS:
        if not os.path.exists(path):
            continue
        sweep_time = os.path.getmtime(path)
        sweep = json.load(open(path))
        for k, v in sweep.items():
            if dump_mtime(k) > sweep_time:
                print(f'drop stale measurement {k} from {path} '
                      f'(dump newer than sweep)')
                continue
            union[k] = v
    json.dump(union, open(UNION, 'w'), indent=1, sort_keys=True)
    print(f'union: {len(union)} keys,',
          dict(Counter(v["status"] for v in union.values())))

    r = subprocess.run(
        [sys.executable, '/root/repo/tools/merge_correctness.py',
         DUMP_DIR, UNION, OUT, '/tmp/graft/sf10',
         '/root/repo/artifacts/CORRECTNESS_sf10_r13.json'],
        capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout, r.stderr)
        sys.exit(1)

    art = json.load(open(OUT))
    q = art['queries']

    # Named oracle-side dispositions: compare ATTEMPTED, resource-limited
    # on this host. Overridden automatically if a later sweep records pass.
    SPILL = ('oracle_infeasible_on_host',
             'DuckDB oracle spill exceeds host free disk (~47-53 GB) — '
             'retried in r14 at 100 GB memory_limit and again in r15 at '
             '110 GB with a dedicated temp_directory on maximum free disk; '
             'the quadratic/closure intermediate cannot spill within this '
             'host. Engine output dumped, oracled green at sf0.01/0.1/1')
    overrides = {}

    def resource_limited(key):
        """True only when the non-pass status looks like a host resource
        limit (spill/OOM/timeout), NOT a value mismatch — a genuine FAIL
        from a future sweep must surface, never be relabeled as an
        oracle-infeasibility (r15 ADVICE)."""
        e = q.get(key, {})
        st = e.get('status')
        if st == 'pass':
            return False
        det = (e.get('detail') or e.get('why') or '') + ' ' + (st or '')
        markers = ('No space left', 'disk spill', 'spill', 'MemoryError',
                   'bad allocation', 'OutOfMemory', 'timeout', 'timed out',
                   'oracle_infeasible', 'oracle_error', 'killed')
        return any(m.lower() in det.lower() for m in markers)

    if q.get('q_geo_knn', {}).get('status') not in ('pass',) and resource_limited('q_geo_knn'):
        overrides['q_geo_knn'] = (
            'oracle_infeasible_on_host',
            'engine two-phase kNN completes at sf10 in 14.6 s after the r15 '
            'fan-out repartition pin (r14: 171.6 s; r13: >480 s cap); the '
            'DuckDB oracle (3x3-blocked haversine CTE chain) died again in '
            'the r15 retry writing >44 GB spill at 110 GB memory_limit '
            '(r14: 745 s then >53 GB spill death)')
    if q.get('q_geo_join', {}).get('status') not in ('pass',) and resource_limited('q_geo_join'):
        overrides['q_geo_join'] = (
            'oracle_infeasible_on_host',
            'engine cell-blocked distance join completes at sf10 in 14.3 s '
            'after the r15 candidatesFor repartition pin (r14 recorded it '
            'engine-infeasible by arithmetic — falsified by measurement; '
            'fresh dump committed); the DuckDB oracle (materialized '
            'haversine CTE chain over ~1.2e9 candidate pairs) died in the '
            'r15 retry at 689 s writing >44 GB spill at 110 GB memory_limit')
    for k in ['d_components', 'd_survivor_pick', 'g_local_clustering',
              'd_dedup_report', 'g_link_predict']:
        if q.get(k, {}).get('status') in ('FAIL', 'fail'):
            det = q[k].get('detail', '')
            if 'No space left' in det or 'disk spill' in det:
                overrides[k] = SPILL
    if (q.get('t_bigram_ce', {}).get('status') in ('FAIL', 'oracle_error')
            and resource_limited('t_bigram_ce')):
        overrides['t_bigram_ce'] = (
            'oracle_infeasible_on_host',
            'DuckDB bigram-LM oracle exhausts host memory (OOM bad '
            'allocation at 80-100 GB memory_limit, both bit-image and '
            'hash-mode); engine output dumped, oracled green at '
            'sf0.01/0.1/1')
    for k, (st, why) in overrides.items():
        if k in q:
            q[k] = {'status': st, 'why': why}

    c = Counter(v['status'] for v in q.values())
    art['summary'] = {
        'pass': c.get('pass', 0),
        'rows_only_dumped': c.get('rows_only_dumped', 0),
        'FAIL': c.get('FAIL', 0),
        'oracled': art['summary'].get('oracled'),
        'other': {k: v['status'] for k, v in q.items()
                  if v['status'] not in ('pass', 'rows_only_dumped')},
    }
    json.dump(art, open(OUT, 'w'), indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in art['summary'].items()
                      if k != 'other'}, indent=1))
    print('exceptions:', len(art['summary']['other']))
    for k, v in sorted(art['summary']['other'].items()):
        print(' ', k, v)


if __name__ == '__main__':
    main()
