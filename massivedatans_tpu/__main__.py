from massivedatans_tpu.cli import main

main()
