#!/usr/bin/env python3
"""A/B drift attribution (round-11 VERDICT item 2).

Compares three per-query measurements on the common-342 set:
  bench/r09_final.json        -- r09 code, r09-era box session (the pin)
  bench/ab_r09code_common.json -- r09 code, TODAY's box, quiet min-of-2
  bench/ab_r12code_common.json -- r12 HEAD,  TODAY's box, quiet min-of-2

Buckets:
  environment = ab_r09code_now vs r09_final      (same code, different day)
  code effect = ab_r12code_now vs ab_r09code_now (same day, different code)
  within code effect, the known GridRank/restructure trades are listed
  individually; the residual distribution is the 'session overhead /
  everything else' bucket.

Dev-only tooling (like validate.py): the shipped library has no Python.
"""
import json, statistics

REPO = "/root/repo"

def load(p):
    return json.load(open(f"{REPO}/bench/{p}"))["queries"]

r09_pin = load("r09_final.json")
r09_now = load("ab_r09code_common.json")
r12_now = load("ab_r12code_common.json")

common = sorted(set(r09_pin) & set(r09_now) & set(r12_now))
print(f"common set: {len(common)} queries\n")

def tot(d): return sum(abs(d[q]) for q in common)

t_pin, t_r09now, t_r12now = tot(r09_pin), tot(r09_now), tot(r12_now)
print(f"r09 code @ r09 session (pin) : {t_pin:8.1f} s")
print(f"r09 code @ today             : {t_r09now:8.1f} s   env drift ×{t_r09now/t_pin:.3f}")
print(f"r12 code @ today             : {t_r12now:8.1f} s   code effect ×{t_r12now/t_r09now:.3f}")
print(f"combined (r12@today / pin)   : ×{t_r12now/t_pin:.3f}\n")

def ratios(a, b):
    return {q: abs(b[q]) / max(abs(a[q]), 1e-9) for q in common}

env = ratios(r09_pin, r09_now)
code = ratios(r09_now, r12_now)

for name, rr in [("ENV (r09now/pin)", env), ("CODE (r12now/r09now)", code)]:
    vals = sorted(rr.values())
    med = statistics.median(vals)
    print(f"{name}: median ×{med:.3f}  p25 ×{vals[len(vals)//4]:.3f}  "
          f"p75 ×{vals[3*len(vals)//4]:.3f}")
    movers = sorted(rr.items(), key=lambda kv: -kv[1])[:12]
    base = r09_pin if "ENV" in name else r09_now
    newd = r09_now if "ENV" in name else r12_now
    for q, r in movers:
        if r >= 1.5:
            print(f"    {q:38s} ×{r:5.2f}  {abs(base[q]):6.2f} -> {abs(newd[q]):6.2f} s")
    print()

# top absolute movers in the code bucket
print("top absolute CODE movers (|delta| > 0.5 s):")
deltas = sorted(((abs(r12_now[q]) - abs(r09_now[q]), q) for q in common))
movers = deltas[:8] + deltas[-8:] if len(deltas) > 16 else deltas
for d, q in movers:
    if abs(d) > 0.5:
        print(f"    {q:38s} {abs(r09_now[q]):6.2f} -> {abs(r12_now[q]):6.2f} s  ({d:+.2f})")
