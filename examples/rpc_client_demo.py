"""Kurento-style RPC round trip using the GENERATED client library
(clients/python/nubomedia_vca_client.py, produced from the kmd.json IDL by
api/client_gen.py — the kurento-module-creator analog): start the server,
create a pipeline and a face detector, configure it, subscribe to OnFace,
feed frames, receive the event.

    python examples/rpc_client_demo.py
"""

import os
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    from nubomedia_vca_tpu import force_cpu_backend
    force_cpu_backend()
    from fixtures import face_clip
    from nubomedia_vca_tpu.api import client_gen, idl
    from nubomedia_vca_tpu.api.rpc import VcaRpcServer

    # regenerate IDL + client (cheap, always in sync with the api surface)
    idl.emit_all(os.path.join(ROOT, "idl"))
    client_gen.generate(os.path.join(ROOT, "idl"),
                        os.path.join(ROOT, "clients"))
    sys.path.insert(0, os.path.join(ROOT, "clients", "python"))
    import nubomedia_vca_client as kc

    srv = VcaRpcServer(port=0, frame_size=(640, 480)).start()
    client = kc.KurentoClient("127.0.0.1", srv.port)

    pipe = client.create_pipeline()
    fd = pipe.createNuboFaceDetector()
    print("created:", pipe.id, fd.id)
    fd.multiScaleFactor(scaleFactor=25)
    fd.widthToProcess(width=160)
    fd.showFaces(viewFaces=1)
    fd.activateServerEvents(activate=1, time=0)

    got = []
    fd.onFace(lambda data: got.append(data))

    # feed frames host-side (media ingest plane)
    srv.objects[fd.id].process(face_clip(1))
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.05)
    print("event:", str(got[0])[:200] if got else "none", "...")
    fd.release()
    client.close()
    srv.stop()


if __name__ == "__main__":
    main()
