# Build targets mirroring the reference Makefile (DB json + annotation
# caches).  CHIME5_DIR must point at a CHiME-5 corpus tree; for a
# synthetic fixture see `make synthetic`.
CHIME5_DIR ?= CHiME5
CHIME6_DIR ?= cache/CHiME6

.PHONY: ext test ci synthetic

ext:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -q

ci:
	./ci.sh

cache:
	mkdir -p cache

cache/chime5.json: cache
	python -m pb_chime5_tpu.database.create_json \
		--database-path $(CHIME5_DIR) --json-path cache/chime5.json

cache/chime6.json: cache $(CHIME6_DIR)
	python -m pb_chime5_tpu.database.create_json \
		--database-path $(CHIME6_DIR) --json-path cache/chime6.json \
		--chime6

$(CHIME6_DIR):
	# Generate a dummy CHiME-6 tree from CHiME-5 (flattened timestamps)
	python -m pb_chime5_tpu.scripts.simulate_chime6_transcriptions \
		$(CHIME5_DIR) $(CHIME6_DIR)

cache/annotation/S02.pkl: cache/chime5.json
	python -m pb_chime5_tpu.activity_alignment \
		--database-path cache/chime5.json --out-dir cache
	# Use with: python -m pb_chime5_tpu.scripts.run test_run with \
	#   session_id=dev activity_type=path activity_path=cache/annotation

synthetic: cache
	python -c "from pb_chime5_tpu.testing import create_synthetic_chime5; \
		create_synthetic_chime5('$(CHIME5_DIR)', session_ids=('S02',), \
		duration_seconds=30.0)"
