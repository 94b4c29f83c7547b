.PHONY: test bench zip scaling verify iceberg

# Iceberg runtime for the TableIO catalog seam (needs network; the
# offline sandbox skips its 1 test gracefully without it). The jar
# lands in jars/, which kgpipe.session.get_spark puts on the session
# classpath automatically.
ICEBERG_VERSION ?= 1.10.0
ICEBERG_ARTIFACT = iceberg-spark-runtime-4.0_2.13
iceberg:
	mkdir -p jars
	curl -fL -o jars/$(ICEBERG_ARTIFACT)-$(ICEBERG_VERSION).jar \
	  https://repo1.maven.org/maven2/org/apache/iceberg/$(ICEBERG_ARTIFACT)/$(ICEBERG_VERSION)/$(ICEBERG_ARTIFACT)-$(ICEBERG_VERSION).jar
	@echo "Iceberg runtime fetched; tests marked skip-without-jar now run."

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

zip:
	rm -f kgpipe.zip && zip -qr kgpipe.zip kgpipe -x '*__pycache__*'

scaling:
	python tools/scaling_report.py
	python tools/scaling_probe.py

# end-to-end smoke: the driver contract + CLI surfaces
verify:
	python -c "import __spark_entry__ as e; from kgpipe.session import get_spark; s=get_spark(master='local[4]'); df=e.entry(s); print(df.count(), 'rows'); s.stop()"
	python -m kgpipe.cli dump-rules | head -3
