"""Probe preamble layouts across CPC formats empirically."""
from cpc_jvm import gateway
gw = gateway()
jvm = gw.jvm

def mk(lgk, n, merged=False):
    sk = jvm.org.apache.datasketches.cpc.CpcSketch(lgk)
    for i in range(n):
        sk.update(i)
    if merged:
        u = jvm.org.apache.datasketches.cpc.CpcUnion(lgk)
        u.update(sk)
        sk = u.getResult()
    return sk

for lgk, n in [(10, 0), (10, 5), (10, 90), (10, 400), (10, 2000), (10, 9000), (10, 200000)]:
    for merged in (False, True):
        sk = mk(lgk, n, merged)
        b = bytes(sk.toByteArray())
        flags = b[5]
        fmt = ((flags >> 4) & 1) << 2 | ((flags >> 3) & 1) << 1 | ((flags >> 2) & 1)
        print(f"lgk={lgk} n={n} merged={merged} flavor={sk.getFlavor().toString()} len={len(b)} preInts={b[0]} fiCol={b[4]} flags={flags:#04x} fmt={fmt} est={sk.getEstimate():.3f}")
