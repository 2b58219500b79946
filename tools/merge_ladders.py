"""Merge the round-5 ladder legs into the two committed anchor files:

LADDER_r05_gen.json  — generated tables (legacy trio from the first leg +
                       pan48/occl/textgrad from LADDER_r05_gen_new.json)
LADDER_r05.json      — default literal tables (LADDER_r05_lit_legacy.json
                       + LADDER_r05_lit_new.json), with bd_rate_y_pct vs
                       the generated anchor per clip.

Run from the repo root after the three ladder legs complete."""
import json
import sys

sys.path.insert(0, ".")
from tools.ladder import QPS, bd_rate


def load(p):
    with open(p) as f:
        return json.load(f)


def pts(res, seq):
    return [(res[seq][str(q)]["bits_per_frame"], res[seq][str(q)]["psnr_y"])
            for q in QPS if str(q) in res.get(seq, {})]


gen = load("LADDER_r05_gen.json")
gen_new = load("LADDER_r05_gen_new.json")
gen["results"].update(gen_new["results"])
gen["toolset"].update(gen_new.get("toolset", {}))
gen["note"] = ("generated-tables anchor (VVCTPU_SPEC_TABLES=0); legacy "
               "trio byte-identical to LADDER_r04.json (BD 0.0 — the r5 "
               "perf chain is bit-exact)")
with open("LADDER_r05_gen.json", "w") as f:
    json.dump(gen, f, indent=1)

lit = load("LADDER_r05_lit_legacy.json")
lit_new = load("LADDER_r05_lit_new.json")
lit["results"].update(lit_new["results"])
lit["toolset"].update(lit_new.get("toolset", {}))
bd = {}
for seq in lit["results"]:
    a = pts(gen["results"], seq)
    t = pts(lit["results"], seq)
    if len(a) >= 3 and len(t) >= 3:
        bd[seq] = round(bd_rate(a, t), 2)
lit["bd_rate_vs"] = {"anchor": "LADDER_r05_gen.json (committed)",
                     "bd_rate_y_pct": bd}
lit["note"] = ("default spec-literal DCT2 tables vs the generated anchor; "
               "r5 toolset incl. the rect-leaf tier on pan48/occl/textgrad")
with open("LADDER_r05.json", "w") as f:
    json.dump(lit, f, indent=1)
print("merged; table-flip BD-rate (lit vs gen):", bd)
