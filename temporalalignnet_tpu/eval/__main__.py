from temporalalignnet_tpu.eval.cli import main

main()
