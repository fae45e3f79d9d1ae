"""Mini-driver: replay queries() vs oracle_sql() at sf0.01, 32 cpus.

Env overrides: REPLAY_SF (sf dir), REPLAY_KEYS (comma list of keys).
"""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False)
import duckdb
import numpy as np
import pandas as pd

import os as _os
SF = _os.environ.get("REPLAY_SF", "/root/testdata/sf0.01")
ONLY = set(k for k in
           _os.environ.get("REPLAY_KEYS", "").split(",") if k)
import os
os.chdir("/root/repo")
import __ray_entry__ as E

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")

def to_df(x):
    if hasattr(x, "to_pandas"):
        try:
            return x.to_pandas()
        except Exception:
            pass
    if hasattr(x, "to_arrow"):  # ray Dataset? no
        return x.to_arrow().to_pandas()
    if hasattr(x, "take_all"):
        return pd.DataFrame(x.take_all())
    return pd.DataFrame(x)

def norm(df):
    df = df.copy()
    df = df[sorted(df.columns)]
    # round floats BEFORE row-sorting: 1e-16 noise must not reorder
    # rows between the two frames (the driver rounds before hashing)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort") \
               .reset_index(drop=True)
    return df

def compare(a, b):
    if list(a.columns) != list(b.columns):
        return f"schema {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or \
           np.issubdtype(np.asarray(bv).dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float),
                               rtol=1e-9, atol=1e-9, equal_nan=True):
                return f"values differ in {c}"
        else:
            if not (pd.Series(av).astype(str).values ==
                    pd.Series(bv).astype(str).values).all():
                return f"values differ in {c}"
    return None

qs = E.queries()
oracles = E.oracle_sql()
fails, n_ok = [], 0
t_all = time.time()
for key, fn in qs.items():
    if ONLY and key not in ONLY:
        continue
    t0 = time.time()
    try:
        res = norm(to_df(fn(SF)))
        if key in oracles:
            want = norm(con.execute(oracles[key]).fetchdf())
            err = compare(res, want)
        else:
            # oracle-less keys: the driver's weaker rows-only check —
            # an empty result from a key that should produce rows is
            # a regression worth flagging here
            err = None if len(res) > 0 else "no rows"
        if err:
            fails.append((key, err))
            print(f"FAIL {key}: {err}", flush=True)
        else:
            n_ok += 1
            print(f"ok   {key} ({len(res)} rows, "
                  f"{time.time()-t0:.1f}s)", flush=True)
    except Exception as exc:
        fails.append((key, str(exc)[:200]))
        print(f"ERR  {key}: {exc}", flush=True)
        traceback.print_exc()
print(f"\n{n_ok}/{len(qs)} green in {time.time()-t_all:.0f}s; "
      f"fails={fails}")
ray.shutdown()
sys.exit(1 if fails else 0)
