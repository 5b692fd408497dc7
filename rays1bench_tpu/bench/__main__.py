from rays1bench_tpu.bench.cli import main

main()
