"""Extract the CPC wire-format constant tables from datasketches-java.

These tables (length-limited-unary code, the 22 static Huffman byte tables,
the 16 column permutations, and the ICON polynomial coefficients) are
normative constants of the published CPC serialized format (Apache
DataSketches, Apache-2.0) — analogous to DEFLATE's fixed Huffman tables.
This script bakes them into compat/_cpc_tables.py for the pure-Python
decoder; it is a dev tool, not part of the runtime.
"""
from cpc_jvm import gateway
gw = gateway()
jvm = gw.jvm

def static_field(cname, fname):
    cls = jvm.java.lang.Class.forName(cname)
    f = cls.getDeclaredField(fname)
    f.setAccessible(True)
    return f.get(None)

CD = "org.apache.datasketches.cpc.CompressionData"
IPC = "org.apache.datasketches.cpc.IconPolynomialCoefficients"

# list IconPolynomialCoefficients fields first
cls = jvm.java.lang.Class.forName(IPC)
fields = cls.getDeclaredFields()
for i in range(len(fields)):
    f = fields[i]
    f.setAccessible(True)
    print("IPC field:", f.getType().getSimpleName(), f.getName())
