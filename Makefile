# Development targets (reference analogue: its Makefile runs protoc codegen;
# here there is no codegen — configs are plain dataclasses — so the targets
# are native build, tests, and benchmarks).

.PHONY: native test bench profile docs clean

docs:
	python tools/gen_api_docs.py

native:
	$(MAKE) -C myrtlespeech_tpu/native

test:
	python -m pytest tests/ -q -n auto

bench:
	python bench.py

profile:
	python tools/profile_step.py --batch 32
	python tools/profile_decode.py --batch 8

clean:
	$(MAKE) -C myrtlespeech_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
