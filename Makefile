.PHONY: test bench zip scaling verify

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
