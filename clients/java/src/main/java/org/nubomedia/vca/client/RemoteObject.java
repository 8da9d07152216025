package org.nubomedia.vca.client;

import com.google.gson.JsonElement;
import com.google.gson.JsonObject;

public abstract class RemoteObject {
  protected final NuboVcaClient client;
  public final String id;

  protected RemoteObject(NuboVcaClient client, String id) {
    this.client = client;
    this.id = id;
  }

  protected JsonElement invoke(String operation, JsonObject params) {
    JsonObject p = new JsonObject();
    p.addProperty("object", id);
    p.addProperty("operation", operation);
    p.add("operationParams", params);
    return client.call("invoke", p).get("value");
  }

  public void release() {
    client.release(id);
  }
}
