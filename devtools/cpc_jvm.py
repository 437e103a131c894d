"""Dev harness: talk to datasketches-java 6.2.0 (bundled with PySpark) via py4j.

Used to generate CPC ground-truth vectors and inspect the public wire format.
Not part of the engine runtime.
"""
import glob, os
import pyspark
from py4j.java_gateway import JavaGateway, launch_gateway

def gateway():
    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "datasketches-*.jar"))
    port = launch_gateway(classpath=os.pathsep.join(jars), die_on_exit=True)
    return JavaGateway(gateway_parameters=__import__("py4j.java_gateway", fromlist=["GatewayParameters"]).GatewayParameters(port=port))

if __name__ == "__main__":
    gw = gateway()
    jvm = gw.jvm
    sk = jvm.org.apache.datasketches.cpc.CpcSketch(11)
    for i in range(3):
        sk.update(i)
    b = sk.toByteArray()
    print("n=3 lgk=11 len", len(b), bytes(b).hex())
    print("estimate", sk.getEstimate())
