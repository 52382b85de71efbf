# Developer entrypoints (reference Makefile pattern).
.PHONY: run test bench native clean docker

run:
	python -m voitta_rag_tpu.api.app

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache **/__pycache__

docker:
	docker compose up --build
