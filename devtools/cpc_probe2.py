from cpc_jvm import gateway
import struct
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

CS = jvm.java.lang.Class.forName("org.apache.datasketches.cpc.CompressedState")
Mem = jvm.org.apache.datasketches.memory.Memory
imp = None
for m in CS.getDeclaredMethods():
    if m.getName() == "importFromMemory":
        m.setAccessible(True); imp = m
def cstate(b):
    mem = Mem.wrap(b)
    arr = gw.new_array(jvm.java.lang.Object, 1)
    arr[0] = mem
    st = imp.invoke(None, arr)
    d = {}
    for f in CS.getDeclaredFields():
        f.setAccessible(True)
        v = f.get(st)
        try:
            v = list(v)[:6]
        except Exception:
            pass
        d[f.getName()] = v
    return d

for lgk, n, merged in [(10, 2000, True), (10, 2000, False), (10, 9000, True), (10, 400, True)]:
    sk = mk(lgk, n, merged)
    jb = sk.toByteArray()
    b = bytes(jb)
    st = cstate(jb)
    print(f"--- lgk={lgk} n={n} merged={merged} flags={b[5]:#x}")
    print({k: v for k, v in st.items() if not isinstance(v, list)})
    ints = struct.unpack_from(f"<{min(len(b)//4, 8)}I", b, 0)
    print("first ints:", [hex(x) for x in ints])
