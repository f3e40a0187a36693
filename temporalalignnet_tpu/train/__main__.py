from temporalalignnet_tpu.train.cli import main

main()
