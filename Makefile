# Common workflows. CPU targets force the cpu platform (safe on dev
# boxes); bench/train-tpu use the real chip.

PY := python

.PHONY: test smoke bench dryrun synth parity clean

# Released-weight parity gate: fails fast listing missing assets; runs
# spm golden check + .pth conversion + tools/test.py eval when mounted.
# Override SIMVG_CKPT/SPM/ANNS/IMGS/CONFIG/EXPECT via env.
parity:
	bash tools/parity_gate.sh

test:
	$(PY) -m pytest tests/ -x -q

synth:
	$(PY) tools/make_synth_data.py

smoke: synth
	$(PY) tools/train.py configs/smoke/tiny_synth.py --platform cpu \
	    --work-dir work_dir/smoke --cfg-options scheduler_config.max_epoch=1
	$(PY) tools/test.py configs/smoke/tiny_synth.py work_dir/smoke/latest \
	    --platform cpu
	$(PY) tools/inference.py configs/smoke/tiny_synth.py \
	    work_dir/smoke/latest --platform cpu --max-images 2

dryrun:
	JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	$(PY) __graft_entry__.py multichip 8

bench:
	$(PY) bench.py

clean:
	rm -rf work_dir .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
