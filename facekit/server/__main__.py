from facekit.server.app import main

main()
