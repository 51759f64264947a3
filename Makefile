# Static checks + tests (the reference Makefile runs flake8 + mypy; this image
# has neither - compileall catches syntax errors)
staticchecks:
	python -m compileall -q panopticsegforlargescalepointcloud_tpu tests

test:
	python -m pytest tests/ -q

bench:
	python bench.py
