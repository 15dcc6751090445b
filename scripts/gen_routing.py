"""Regenerate ops/pallas/routing.py win tables from the on-chip A/B
artifact (data/output/ab_conv224.json, produced by scripts/ab_conv224.py).

Prints the TRAIN_WINS / EVAL_WINS set literals; paste them into
routing.py (kept as a committed, human-reviewed table rather than a
runtime file read so the routing decision is versioned with the code).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "data/output/ab_conv224.json"
    rows = json.load(open(path))
    train, ev = [], []
    for r in rows:
        if r.get("error"):
            continue
        # shape string like "56x56x64->256 k1 s1"
        s = r["shape"]
        hw, rest = s.split("x", 1)
        h = int(hw)
        cin = int(rest.split("x")[1].split("->")[0])
        cout = int(rest.split("->")[1].split()[0])
        k = int(s.split("k")[1].split()[0])
        stride = int(s.split("s")[-1])
        key = (h, cin, cout, k, stride)
        if r["train_pallas_ms"] < r["train_xla_ms"]:
            train.append((key, r["layer"]))
        if r["eval_pallas_ms"] < r["eval_xla_ms"]:
            ev.append((key, r["layer"]))

    def emit(name, items):
        print(f"{name} = {{")
        for key, layer in items:
            print(f"    {key},  # {layer}")
        print("}")

    emit("TRAIN_WINS", train)
    print()
    emit("EVAL_WINS", ev)


if __name__ == "__main__":
    main()
