from cpc_jvm import gateway
gw = gateway()
jvm = gw.jvm
for cname in ["org.apache.datasketches.cpc.CompressionData",
              "org.apache.datasketches.cpc.IconEstimator",
              "org.apache.datasketches.cpc.CpcCompression",
              "org.apache.datasketches.cpc.CpcUtil"]:
    try:
        cls = jvm.java.lang.Class.forName(cname)
        fields = cls.getDeclaredFields()
        print(cname)
        for i in range(len(fields)):
            f = fields[i]
            print("   ", f.getType().getSimpleName(), f.getName())
    except Exception as e:
        print(cname, "ERR", str(e)[:120])
