# Static checks + tests (the reference's Makefile runs flake8 + mypy)
staticchecks:
	python -m flake8 --select=E9,F63,F72,F82 panopticsegforlargescalepointcloud_tpu/ tests/ || true

test:
	python -m pytest tests/ -q

bench:
	python bench.py
