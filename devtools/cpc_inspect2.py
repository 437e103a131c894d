from cpc_jvm import gateway
gw = gateway()
jvm = gw.jvm
import subprocess, glob, os, pyspark
jar = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "datasketches-java-*.jar"))[0]
out = subprocess.run(["unzip", "-l", jar], capture_output=True, text=True).stdout
for line in out.splitlines():
    if "/cpc/" in line: print(line)
