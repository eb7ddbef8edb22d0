# Convenience entry points; see CLAUDE.md for the full command list.

.PHONY: test native bench parity parity-fast

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

# Reference-parity gate (north star: BASELINE.json configs 1-3). Runs MAE-MSE
# + CE loss parity and token-identical decode on the reference docs examples
# when data/ + reference .pth weights are mounted; reports each sub-check as
# "skipped: <missing artifact>" otherwise. One JSON line either way.
parity:
	python tools/parity_gate.py

parity-fast:
	python tools/parity_gate.py --fast
