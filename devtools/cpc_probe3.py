from cpc_jvm import gateway
gw = gateway()
jvm = gw.jvm
for cname in ["org.apache.datasketches.cpc.CpcCompression",
              "org.apache.datasketches.cpc.CpcUtil",
              "org.apache.datasketches.cpc.IconEstimator",
              "org.apache.datasketches.cpc.BitMatrix"]:
    cls = jvm.java.lang.Class.forName(cname)
    ms = cls.getDeclaredMethods()
    for i in range(len(ms)):
        m = ms[i]
        pts = m.getParameterTypes()
        params = [pts[j].getSimpleName() for j in range(len(pts))]
        print(cname.split(".")[-1] + "." + m.getName() + "(" + ",".join(params) + ")")
