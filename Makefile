# Convenience targets for versband_tpu.

.PHONY: test native bench dryrun clean

test:
	python -m pytest tests/ -q

native:
	g++ -O3 -std=c++17 -shared -fPIC \
	    -o versband_tpu/native/libvbloader.so \
	    versband_tpu/native/batch_loader.cpp -lpthread

bench:
	python bench.py

dryrun:
	python __graft_entry__.py

clean:
	find . -name __pycache__ -type d -exec rm -rf {} +
	rm -f versband_tpu/native/libvbloader.so
