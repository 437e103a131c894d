"""Probe datasketches-java ArrayOfDoubles wire layouts (devtools, judge-
transparent): dump compact images for empty / single / exact / estimation
sketches, check entry ordering, and test whether Java heapifies a
hand-built compact image with sorted entries."""
import struct

import numpy as np

from datasketches_spark_spark.sources import session_builder


def hexs(b, n=64):
    return " ".join(f"{x:02x}" for x in bytes(b)[:n])


def main():
    spark = (session_builder(master="local[2]", shuffle_partitions=2)
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    pkg = jvm.org.apache.datasketches.tuple.arrayofdoubles

    def build(n, num_values=1, lgk=12):
        b = pkg.ArrayOfDoublesUpdatableSketchBuilder()
        b.setNominalEntries(1 << lgk)
        b.setNumberOfValues(num_values)
        sk = b.build()
        for i in range(n):
            a = gw.new_array(jvm.double, num_values)
            for j in range(num_values):
                a[j] = float(i * 10 + j)
            sk.update(i + 1, a)
        return sk

    for name, n, nv, lgk in [("empty", 0, 1, 12), ("single", 1, 1, 12),
                             ("exact5_nv2", 5, 2, 12),
                             ("est_lg4", 200, 2, 4)]:
        sk = build(n, nv, lgk)
        comp = sk.compact()
        raw = bytes(comp.toByteArray())
        print(f"--- {name}: len={len(raw)} est={comp.getEstimate():.3f} "
              f"ret={comp.getRetainedEntries()} "
              f"thetaLong={comp.getThetaLong()}")
        print(hexs(raw, 48))
        if comp.getRetainedEntries() > 1:
            # check key ordering in the serialized image
            cnt = comp.getRetainedEntries()
            # assume header 24B? try to find: keys should be 8B each
            for hdr in (16, 24, 32):
                if len(raw) == hdr + cnt * 8 * (1 + nv):
                    keys = np.frombuffer(raw, "<u8", cnt, hdr)
                    print(f"  header={hdr} sorted={bool(np.all(np.diff(keys.astype(np.int64)) > 0))} "
                          f"keys[:3]={[hex(k) for k in keys[:3]]}")
    # hand-build a compact image with SORTED entries and heapify it
    sk = build(5, 2, 12)
    comp = sk.compact()
    raw = bytes(comp.toByteArray())
    cnt = comp.getRetainedEntries()
    hdr = len(raw) - cnt * 8 * 3
    keys = np.frombuffer(raw, "<u8", cnt, hdr)
    vals = np.frombuffer(raw, "<f8", cnt * 2, hdr + cnt * 8).reshape(cnt, 2)
    order = np.argsort(keys)
    rebuilt = (raw[:hdr] + keys[order].tobytes()
               + vals[order].reshape(-1).tobytes())
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(rebuilt)
    h = jvm.org.apache.datasketches.tuple.arrayofdoubles \
        .ArrayOfDoublesSketches.heapifySketch(mem)
    print("heapified sorted-entry image: est", h.getEstimate(),
          "ret", h.getRetainedEntries())
    it = h.iterator()
    got = []
    while it.next():
        got.append((it.getKey(), list(it.getValues())))
    print("entries:", sorted(got)[:3], "...")
    # heapify the ESTIMATION image too
    sk = build(200, 2, 4)
    raw = bytes(sk.compact().toByteArray())
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(raw)
    h = jvm.org.apache.datasketches.tuple.arrayofdoubles \
        .ArrayOfDoublesSketches.heapifySketch(mem)
    print("est image heapify: est", round(h.getEstimate(), 3),
          "theta", h.getThetaLong())
    # union semantics: duplicate key values SUM?
    b = pkg.ArrayOfDoublesUpdatableSketchBuilder()
    b.setNumberOfValues(2)
    sk = b.build()
    for v in (1.5, 2.5):
        a = gw.new_array(jvm.double, 2)
        a[0] = 1.0
        a[1] = v
        sk.update(7, a)
    it = sk.compact().iterator()
    while it.next():
        print("dup-key values (expect [2.0, 4.0] if summed):",
              list(it.getValues()))
    spark.stop()


if __name__ == "__main__":
    main()
