#!/usr/bin/env python3
"""Alt-seed testdata generator — reproduction harness for driver-only
correctness divergences.

The driver generates its gate data with the same generator but a
different seed, so a hash failure that the seed-42 local data cannot
reproduce may still be data-dependent (value boundaries, dictionary vs
plain parquet encodings, row-group layout). This script synthesizes
events/orders/customer parquet with the SAME schema and marginal shapes
as /root/testdata/sf0.01 under a caller-chosen seed (plus an optional
adversarial mode), symlinks the untouched tables, and leaves a
directory Verify can run against:

  python3 scripts/gen_alt_seed.py 7 /tmp/alt_s7
  sbt -batch "runMain graft.Verify /tmp/alt_s7 /tmp/alt_s7_out c28,c30,c32,c33,c35"
  python3 scripts/check_oracle.py /tmp/alt_s7 /tmp/alt_s7_out

Adversarial mode (seed < 0): values hug the c35 delete boundary
(300.xx), include sub-1.0 and ulp-hostile doubles, and orders prices
span the full decimal(12,2) integer range.
"""
import sys, os, json, random
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
N_EVENTS, N_ORDERS, N_CUST = 10000, 15000, 1500

def gen(seed: int, outdir: str):
    rng = random.Random(abs(seed))
    adversarial = seed < 0
    os.makedirs(outdir, exist_ok=True)

    # --- events ---
    types = ["click", "error", "purchase", "signup", "view"]
    ts0 = 1704067200_000000  # 2024-01-01 in micros
    ev_ts, val = [], []
    t = ts0
    for i in range(N_EVENTS):
        t += rng.randrange(1_000_000, 240_000_000)
        ev_ts.append(t)
        if adversarial:
            mode = i % 5
            if mode == 0:
                v = 300.0 + rng.choice([-0.01, 0.0, 0.005, 0.01]) * rng.random()
            elif mode == 1:
                v = rng.random() * 0.99  # floor()==0 band
            elif mode == 2:
                v = rng.uniform(0, 500)  # full-precision double, no 2dp round
            elif mode == 3:
                v = round(rng.uniform(250, 350), 2)  # dense near the cut
            else:
                v = round(rng.expovariate(1 / 60.0), 2)
        else:
            v = round(rng.expovariate(1 / 60.0) + 0.01, 2)
        val.append(v)
    events = pa.table({
        "event_id": pa.array(range(N_EVENTS), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array([rng.randrange(0, 500) for _ in range(N_EVENTS)], pa.int64()),
        "event_type": pa.array([types[rng.randrange(5)] for _ in range(N_EVENTS)]),
        "value": pa.array(val, pa.float64()),
        "props": pa.array([json.dumps({"k": rng.randrange(100)}) for _ in range(N_EVENTS)]),
    })
    pq.write_table(events, f"{outdir}/events.parquet")

    # --- orders ---
    statuses = ["P", "F", "O"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    if adversarial:
        price = [rng.choice([
            round(rng.uniform(0.01, 10.0), 2),
            round(rng.uniform(1000, 500000), 2),
            round(rng.uniform(9_999_000_000, 9_999_999_999), 2),  # decimal(12,2) ceiling
            rng.uniform(1000, 500000),  # full-precision double
        ]) if rng.random() < 0.75 else rng.uniform(0.01, 500000)
            for _ in range(N_ORDERS)]
    else:
        price = [round(rng.uniform(1000, 500000), 2) for _ in range(N_ORDERS)]
    date0 = 788918400_000000  # 1995-01-01 micros
    orders = pa.table({
        "o_orderkey": pa.array(range(N_ORDERS), pa.int64()),
        "o_custkey": pa.array([rng.randrange(0, N_CUST) for _ in range(N_ORDERS)], pa.int64()),
        "o_orderstatus": pa.array([statuses[rng.randrange(3)] for _ in range(N_ORDERS)]),
        "o_totalprice": pa.array(price, pa.float64()),
        "o_orderdate": pa.array(
            [date0 + rng.randrange(0, 6 * 365) * 86_400_000_000 for _ in range(N_ORDERS)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array([prios[rng.randrange(5)] for _ in range(N_ORDERS)]),
    })
    pq.write_table(orders, f"{outdir}/orders.parquet")

    # everything else is seed-independent for the c-series: symlink
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in ("events.parquet", "orders.parquet"):
            dst = f"{outdir}/{f}"
            if not os.path.exists(dst):
                os.symlink(f"{SRC}/{f}", dst)

if __name__ == "__main__":
    gen(int(sys.argv[1]), sys.argv[2])
    print(f"wrote {sys.argv[2]} (seed={sys.argv[1]})")
